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
}
