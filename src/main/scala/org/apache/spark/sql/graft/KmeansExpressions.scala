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

/**
 * The `n` nearest centroid indices, ordered by ascending squared-L2
 * distance (ties toward the lower index) — the multi-probe generalization
 * of [[NearestCentroid]]: an IVF query explodes this list to visit its
 * `nprobe` most promising cells, while the corpus side keeps exactly one
 * cell per row (probing multiplies only the slim query side). Selection is
 * an insertion pass into two fixed length-n arrays — n is a small constant
 * (≤ k), so no heap allocation per row beyond the result array. Corrupt
 * rows (wrong dim / null element) yield null, as in [[NearestCentroid]].
 */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
    n: Int) extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "centroids must be non-empty and rectangular")
  require(n >= 1 && n <= centroids.length,
    s"n must be in [1, ${centroids.length}], got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_centroids"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) { if (v.isNullAt(j)) return null; j += 1 }
    val bestIdx = new Array[Int](n)
    val bestDist = Array.fill(n)(Double.MaxValue)
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < dim) {
        val diff = v.getFloat(i).toDouble - ctr(i)
        d += diff * diff
        i += 1
      }
      // strict < keeps the lower index on ties (c ascends)
      var p = n
      while (p > 0 && d < bestDist(p - 1)) p -= 1
      if (p < n) {
        var q = n - 1
        while (q > p) { bestDist(q) = bestDist(q - 1); bestIdx(q) = bestIdx(q - 1); q -= 1 }
        bestDist(p) = d; bestIdx(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val arrData = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val ctr = ctx.freshName("ctr")
      val j = ctx.freshName("j"); val hasNull = ctx.freshName("hasNull")
      val bi = ctx.freshName("bestIdx"); val bd = ctx.freshName("bestDist")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
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
         |  final int[] $bi = new int[$n];
         |  final double[] $bd = new double[$n];
         |  java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    final double[] $ctr = $mat[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $diff = ((double) $v.getFloat($i)) - $ctr[$i];
         |      $d += $diff * $diff;
         |    }
         |    int $p = $n;
         |    while ($p > 0 && $d < $bd[$p - 1]) $p--;
         |    if ($p < $n) {
         |      for (int $q = $n - 1; $q > $p; $q--) {
         |        $bd[$q] = $bd[$q - 1]; $bi[$q] = $bi[$q - 1];
         |      }
         |      $bd[$p] = $d; $bi[$p] = $c;
         |    }
         |  }
         |  ${ev.value} = new $arrData($bi);
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

  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ExpressionUtils.column(
      NearestCentroids(ExpressionUtils.expression(vec), centroids, n))
}
