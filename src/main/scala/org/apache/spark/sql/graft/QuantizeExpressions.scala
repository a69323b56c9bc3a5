package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Native int8 symmetric-absmax quantization primitives (the 4×-memory-cut
 * ingest step every ANN index takes before sharding — hot path at 100 TB).
 *
 * Replaces the three interpreted Catalyst HOFs the first formulation used
 * (`array_max(transform(abs))` + two `transform`s — a tight-spread 3.9×
 * regression vs the committed floor under the current runtime): one fused
 * primitive loop per row inside whole-stage codegen. Bit-identical to the
 * HOF / DuckDB-oracle formulation:
 *
 *  - [[AbsMaxDouble]] ≡ `array_max(transform(v, x -> abs(double(x))))`:
 *    null-skipping max, null on empty/all-null arrays, NaN ordered
 *    greatest (`java.lang.Double.compare` — Spark's double ordering).
 *  - [[QuantizeInt8Codes]] ≡ `when(v.isNull, null).when(s > 0,
 *    transform(v, x -> floor(double(x)*127.0/s))).otherwise(transform(v,
 *    _ -> 0L))`: a NULL or non-positive (incl. NaN — `NaN > 0` is false
 *    in both engines) scale yields all-zero codes; a null ELEMENT yields
 *    a null code under a positive scale (floor(null) = null) but 0L in
 *    the zero-scale branch (that transform ignores the element). `floor`
 *    not round: exact in both engines for any double, so the oracle
 *    matches bit-for-bit.
 *
 * 100 TB shape: pure scan-projection — per-row, no shuffle, no state;
 * subexpression elimination merges the scale-output and in-codes AbsMax
 * into one evaluation per row. Codes lie in [-127, 127] so the boxed
 * Long path hits the JVM's small-value cache (no allocation per element).
 *
 * No reference counterpart (the reference has no vector layer); companion
 * to [[graft.operators.Quantize]].
 */
case class AbsMaxDouble(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "abs_max_double"
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = math.abs(a.getFloat(i).toDouble)
        if (!seen || java.lang.Double.compare(d, m) > 0) { m = d; seen = true }
      }
      i += 1
    }
    if (seen) m else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val m = ctx.freshName("m"); val seen = ctx.freshName("seen")
    val d = ctx.freshName("d")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        final int $n = ${c.value}.numElements();
        double $m = 0.0; boolean $seen = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!${c.value}.isNullAt($i)) {
            final double $d = java.lang.Math.abs((double) ${c.value}.getFloat($i));
            if (!$seen || java.lang.Double.compare($d, $m) > 0) { $m = $d; $seen = true; }
          }
        }
        if ($seen) { ${ev.isNull} = false; ${ev.value} = $m; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class QuantizeInt8Codes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "quantize_int8_codes"
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val s = right.eval(input)
    val sPos = s != null && s.asInstanceOf[Double] > 0.0
    val scale = if (sPos) s.asInstanceOf[Double] else 0.0
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (!sPos) java.lang.Long.valueOf(0L)
        else if (a.isNullAt(i)) null
        else java.lang.Long.valueOf(
          math.floor(a.getFloat(i).toDouble * 127.0 / scale).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val sPos = ctx.freshName("sPos"); val sc = ctx.freshName("sc")
    val arr = ctx.freshName("arr")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${l.isNull}) {
        final boolean $sPos = !${r.isNull} && ${r.value} > 0.0;
        final double $sc = $sPos ? ${r.value} : 0.0;
        final int $n = ${l.value}.numElements();
        final Object[] $arr = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if (!$sPos) {
            $arr[$i] = java.lang.Long.valueOf(0L);
          } else if (${l.value}.isNullAt($i)) {
            $arr[$i] = null;
          } else {
            $arr[$i] = java.lang.Long.valueOf(
              (long) java.lang.Math.floor((double) ${l.value}.getFloat($i) * 127.0 / $sc));
          }
        }
        ${ev.isNull} = false;
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Sign-bit binary quantization: bit i of the output word is set iff
 * `v(i) > 0` — the 32× memory cut of binary-embedding retrieval (one BIT
 * per float32 dimension), the coarsest tier of the quantization ladder
 * (sign 1-bit → int8 → PQ). Dimensions ≤ 64 pack into ONE BIGINT, which
 * keeps the per-PAIR hot op pure built-in codegen (`bit_count(a ^ b)` =
 * Hamming distance, a two-instruction XOR+POPCNT inside whole-stage
 * codegen) — a multi-word generalization would move the pair op into an
 * interpreted zip_with, so dims > 64 deliberately yield NULL (a vector
 * that cannot be packed cannot be probed; same contract as residual
 * encode on corrupt rows). A null ELEMENT leaves its bit unset — in the
 * oracle `NULL > 0` is NULL and the CASE falls through to 0, so both
 * engines agree. Unlike [[SrpBucket]] (sign of |planes|·dim random
 * projections), this is the sign of the RAW dimensions: zero multiplies,
 * exactly replayable in SQL, and the standard binary-embedding layout.
 *
 * 100 TB shape: pure scan-projection at ingest; the index is 8 B/vector.
 */
case class SignBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n > 64) return null
    var bits = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getFloat(i) > 0.0f) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val bits = ctx.freshName("bits")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        final int $n = ${c.value}.numElements();
        if ($n <= 64) {
          long $bits = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if (!${c.value}.isNullAt($i) && ${c.value}.getFloat($i) > 0.0f) {
              $bits |= (1L << $i);
            }
          }
          ${ev.isNull} = false;
          ${ev.value} = $bits;
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftQuantize {
  def absMax(v: Column): Column =
    ExpressionUtils.column(AbsMaxDouble(ExpressionUtils.expression(v)))

  def int8Codes(v: Column, scale: Column): Column =
    ExpressionUtils.column(QuantizeInt8Codes(
      ExpressionUtils.expression(v), ExpressionUtils.expression(scale)))

  def signBits(v: Column): Column =
    ExpressionUtils.column(SignBits(ExpressionUtils.expression(v)))
}
