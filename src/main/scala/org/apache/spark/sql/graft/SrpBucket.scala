package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Sign-random-projection bucket id of a float-embedding column: bit p is
 * set iff ⟨v, planes(p)⟩ > 0. The hyperplanes are a per-expression
 * constant (deterministic seed upstream), so the whole bucket computation
 * is one primitive loop per row — value-identical to the interpreted
 * zip_with/aggregate formulation it replaces (same left-to-right double
 * accumulation), which walked an expression tree per (plane × dimension).
 * Per-row work is |planes|·dim multiplies; CodegenFallback's one virtual
 * call per row is noise against that (the per-PAIR expressions carry full
 * doGenCode instead).
 */
case class SrpBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  // planes is Seq-of-Seq (not Array) so case-class equality is structural —
  // canonicalization / common-subexpression elimination can dedupe two
  // SrpBucket instances built from the same seed. The hot loop indexes a
  // pre-flattened Array copy.
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val planesLocal = planeArr
    var bucket = 0L
    var p = 0
    while (p < planesLocal.length) {
      val plane = planesLocal(p)
      // Dimension mismatch (corrupt/short embedding): bit stays unset —
      // the HOF formulation's zip_with null-padding poisoned the dot
      // product to null, failing the > 0 test. Never a silently-truncated
      // partial dot product.
      if (plane.length == n) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += plane(i) * v.getFloat(i).toDouble; i += 1 }
        if (dot > 0) bucket |= (1L << p)
      }
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftSrp {
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(SrpBucket(ExpressionUtils.expression(vec),
      planes.toSeq.map(_.toSeq)))

  def srpProbes(vec: Column, planes: Array[Array[Double]], maxProbes: Int): Column =
    ExpressionUtils.column(SrpProbes(ExpressionUtils.expression(vec),
      planes.toSeq.map(_.toSeq), maxProbes))
}

/**
 * Multi-probe SRP bucket list (Lv et al., "Multi-Probe LSH", VLDB'07):
 * the base bucket plus the `maxProbes - 1` cheapest perturbations, where a
 * perturbation flips a subset (size ≤ 3) of the planes with the smallest
 * |⟨v, plane⟩| margin and costs the sum of the flipped margins. A true
 * neighbor that lands one bucket away almost always differs in exactly the
 * low-margin bits, so probing them recovers most of the recall that a
 * single-bucket lookup loses — at probes/2^nPlanes extra candidate
 * fraction per table instead of more tables (which would multiply the
 * CORPUS index size; probing only multiplies the slim query side).
 *
 * Per-row work on top of the |planes|·dim dots that SrpBucket already
 * does: scoring the ≤ (nP + nP²/2 + nP³/6) static subsets and one small
 * sort — trivial next to the dot products. Applied query-side only.
 */
case class SrpProbes(child: Expression, planes: Seq[Seq[Double]], maxProbes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(maxProbes >= 1, "maxProbes must be >= 1")

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  // Static rank-index subsets (positions into the per-row margin order),
  // sizes 1..3; scored per row with that row's margins.
  @transient private lazy val subsets: Array[Array[Int]] = {
    val nP = planes.length
    val b = Array.newBuilder[Array[Int]]
    for (i <- 0 until nP) b += Array(i)
    for (i <- 0 until nP; j <- (i + 1) until nP) b += Array(i, j)
    for (i <- 0 until nP; j <- (i + 1) until nP; l <- (j + 1) until nP)
      b += Array(i, j, l)
    b.result()
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_probes"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val planesLocal = planeArr
    val nP = planesLocal.length
    val dots = new Array[Double](nP)
    var base = 0L
    var p = 0
    while (p < nP) {
      val plane = planesLocal(p)
      // Same dimension-mismatch contract as SrpBucket: bit unset, margin 0.
      if (plane.length == n) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += plane(i) * v.getFloat(i).toDouble; i += 1 }
        dots(p) = dot
        if (dot > 0) base |= (1L << p)
      }
      p += 1
    }
    if (maxProbes == 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(base))
    val order = Array.range(0, nP).sortBy(i => math.abs(dots(i)))
    val scored = subsets.map { sub =>
      var score = 0.0
      var mask = 0L
      var i = 0
      while (i < sub.length) {
        val pi = order(sub(i))
        score += math.abs(dots(pi))
        mask |= (1L << pi)
        i += 1
      }
      (score, base ^ mask)
    }
    val rest = scored.sortBy(_._1).take(maxProbes - 1).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(base +: rest)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
