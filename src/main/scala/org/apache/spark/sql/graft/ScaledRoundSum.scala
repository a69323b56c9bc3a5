package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Native fold of a float array into `Σ CAST(round(x * scale) AS BIGINT)`
 * (`halfUpMode = true`) or `Σ CAST(floor(x * scale + 0.5) AS BIGINT)`
 * (`halfUpMode = false`) — the decoded-pixel / decoded-sample checksum
 * every multimodal roundtrip query emits.
 *
 * Bit-compatible with the HOF formulation it replaces
 * (`aggregate(pixels, 0L, (acc, x) -> acc + CAST(round(x * S) AS BIGINT))`):
 * Spark coerces that lambda to `cast(round(cast(x as double) * S, 0) as
 * bigint)` whose double-typed `round` is `BigDecimal.valueOf(d)
 * .setScale(0, HALF_UP)` behind a NaN/Inf passthrough (verified against
 * the emitted whole-stage code). [[ScaledRoundSum.roundHalfUp]] replays
 * exactly that: |d| < 0.5 is answered 0 directly (the one binade where
 * `floor(|d| + 0.5)` can diverge — ±0.49999999999999994 sits finer than
 * 0.5 and the addition rounds up; ADVICE r16), for finite 0.5 <= |d| <=
 * 2^50 the decimal HALF_UP of the shortest-repr double provably equals
 * the sign-symmetric `floor(|d| + 0.5)` (the addition is exact in that
 * range and a shortest-decimal fraction of exactly .5 implies d IS n.5,
 * both representable there), and beyond 2^50 — unreachable for pixel/sample
 * products, kept for honesty — it falls back to the same BigDecimal
 * call Spark makes. A null element nulls the whole sum, matching the
 * HOF's null-poisoned accumulator.
 *
 * The HOF walks an interpreted lambda tree per element AND pays the
 * per-element BigDecimal allocation; this is one fused primitive loop
 * inside whole-stage codegen — on a 3 072-float pixel row the fold goes
 * from the scan's dominant cost to noise, which is the difference
 * between decode-bound and checksum-bound codec queries at 100 TB.
 */
case class ScaledRoundSum(child: Expression, scale: Double,
    halfUpMode: Boolean) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  override def prettyName: String = "scaled_round_sum"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble * scale
      sum += (if (halfUpMode) ScaledRoundSum.roundHalfUpToLong(d)
              else ScaledRoundSum.floorHalfToLong(d))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sum = ctx.freshName("sum"); val d = ctx.freshName("d")
      val cls = classOf[ScaledRoundSum].getName
      val term =
        if (halfUpMode) s"$cls.roundHalfUpToLong($d)"
        else s"$cls.floorHalfToLong($d)"
      // constants interpolated as literals (CLAUDE.md Janino rule); no
      // generated line begins with '|' (CodegenGuardSpec rule)
      s"""
         |final int $n = $a.numElements();
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $d = ((double) $a.getFloat($i)) * ${scale}D;
         |  $sum += $term;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScaledRoundSum {

  /** 2^50: below this `d + 0.5` is exact and shortest-decimal HALF_UP
   *  coincides with the float trick (see class doc). */
  private val FastPathBound = 1125899906842624.0

  /** Exactly Spark's `cast(round(d, 0) as bigint)` under ANSI: the
   *  NaN/Inf passthrough + BigDecimal HALF_UP of `Round(DoubleType)`,
   *  then the range-checked long cast. */
  def roundHalfUpToLong(d: Double): Long = {
    val r =
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
      else if (d > -0.5 && d < 0.5) {
        // |d| strictly below one half rounds to 0 under decimal HALF_UP.
        // The float trick alone gets ±0.49999999999999994 wrong (it sits
        // in a finer binade than 0.5, so d + 0.5 rounds UP to 1.0) — the
        // single divergence value below 2^50 (ADVICE r16). Handling the
        // open interval here makes the fast path exact everywhere.
        0.0
      } else if (d >= -FastPathBound && d <= FastPathBound) {
        if (d >= 0) Math.floor(d + 0.5) else -Math.floor(-d + 0.5)
      } else java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    toLongChecked(r)
  }

  /** Exactly Spark's `cast(floor(d + 0.5) as bigint)` under ANSI. */
  def floorHalfToLong(d: Double): Long =
    toLongChecked(Math.floor(d + 0.5))

  private def toLongChecked(r: Double): Long = {
    // Spark's ANSI double->bigint guard (overflow/NaN fails loudly, as
    // the HOF's cast would; unreachable for decoded pixels/samples).
    if (!(Math.floor(r) <= Long.MaxValue.toDouble &&
        Math.ceil(r) >= Long.MinValue.toDouble))
      throw new ArithmeticException(
        s"scaled_round_sum: $r overflows BIGINT (matches ANSI cast failure)")
    r.toLong
  }

  /** `Σ CAST(round(x * scale) AS BIGINT)` over a float-array column. */
  def scaledRoundSum(arr: Column, scale: Double): Column =
    ExpressionUtils.column(
      ScaledRoundSum(ExpressionUtils.expression(arr), scale, halfUpMode = true))

  /** `Σ CAST(floor(x * scale + 0.5) AS BIGINT)` over a float-array column. */
  def scaledFloorHalfSum(arr: Column, scale: Double): Column =
    ExpressionUtils.column(
      ScaledRoundSum(ExpressionUtils.expression(arr), scale, halfUpMode = false))
}
