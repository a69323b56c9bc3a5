package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Nearest-centroid assignment for Lloyd's k-means: index (0-based) of the
 * centroid minimizing squared-L2 distance to a float-array embedding, with
 * ties broken toward the lowest index. The centroid matrix rides along as
 * a literal reference object (k·dim doubles — the same bytes a broadcast
 * would ship), so the k·dim FMA loop runs fused inside whole-stage codegen
 * next to the scan. A Catalyst HOF argmin over an array-of-arrays literal
 * would walk an interpreted lambda tree per (element × k) — the hot-loop
 * case CLAUDE.md bans from HOFs.
 *
 * Rows whose embedding length differs from the centroid dim — or that
 * carry a null element — yield null (corrupt row), never a
 * plausible-but-wrong assignment.
 */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "centroids must be non-empty and rectangular")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) { if (v.isNullAt(j)) return null; j += 1 }
    var best = 0; var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < dim) {
        val diff = v.getFloat(i).toDouble - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist"); val ctr = ctx.freshName("ctr")
      val j = ctx.freshName("j"); val hasNull = ctx.freshName("hasNull")
      s"""
         |final int $dim = $mat[0].length;
         |boolean $hasNull = false;
         |if ($v.numElements() == $dim) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $hasNull = true; break; }
         |  }
         |}
         |if ($v.numElements() != $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0; double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    final double[] $ctr = $mat[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $diff = ((double) $v.getFloat($i)) - $ctr[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestDist) { $bestDist = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-L2 distance to the NEAREST centroid — the per-row term of the
 *  k-means objective (within-cluster sum of squares). Same loop as
 *  [[NearestCentroid]], returning the distance instead of the index; used
 *  for convergence metrics, never on the assignment hot path twice. */
case class NearestCentroidDist(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "centroids must be non-empty and rectangular")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "nearest_centroid_dist"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) { if (v.isNullAt(j)) return null; j += 1 }
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < dim) {
        val diff = v.getFloat(i).toDouble - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestDist) bestDist = d
      c += 1
    }
    bestDist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val bestDist = ctx.freshName("bestDist")
      val ctr = ctx.freshName("ctr")
      val j = ctx.freshName("j"); val hasNull = ctx.freshName("hasNull")
      s"""
         |final int $dim = $mat[0].length;
         |boolean $hasNull = false;
         |if ($v.numElements() == $dim) {
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $hasNull = true; break; }
         |  }
         |}
         |if ($v.numElements() != $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    final double[] $ctr = $mat[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $diff = ((double) $v.getFloat($i)) - $ctr[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestDist) { $bestDist = $d; }
         |  }
         |  ${ev.value} = $bestDist;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftKmeans {
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(vec), centroids))

  def nearestCentroidDist(vec: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      NearestCentroidDist(ExpressionUtils.expression(vec), centroids))
}
