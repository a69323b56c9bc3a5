package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Native signed-random-projection dimensionality reduction (the
 * Johnson–Lindenstrauss / Achlioptas 2003 ±1 projection): maps a
 * `dIn`-dim float vector to `dOut` BIGINT components
 *
 *   y_j = Σ_i sign(i, j) · floor(x_i · scale)
 *
 * with the sign matrix DERIVED, not stored — the same portable
 * overflow-free arithmetic mixer recipe the sampling family uses
 * (`Sampling.hashSplit` et al.), so a SQL oracle replays every component
 * exactly with no RNG state and no FP dot products:
 *
 *   key    = i1 · dOut + j          (i1 = 1-based input index, j 0-based)
 *   m      = ((key mod 999983) · 2654435761) mod 2³²
 *   sign   = +1 if m < 2³¹ else −1
 *
 * (Knuth multiplicative hash; the TOP bit decides the sign — low bits of
 * a multiplicative hash mod 2³² are poorly mixed.) Quantizing inputs to
 * integer `scale` units BEFORE the sum makes the whole projection
 * integer-exact: no float summation order to disagree on, cross-engine.
 * |y_j| ≤ dIn · scale · max|x| keeps 64-bit headroom up to millions of
 * dimensions. Null elements contribute 0 (spec-pinned); a null vector
 * projects to null.
 *
 * Why native: the per-row cost is a dIn × dOut multiply-add loop — the
 * CLAUDE.md per-(element×k) rule — and the HOF formulation
 * (`transform(sequence(...), j -> aggregate(...))`) is interpreted. Here
 * the whole loop fuses into whole-stage codegen.
 *
 * 100 TB shape: pure scan projection — no shuffle, no state, no stored
 * projection matrix to broadcast. This is the ingest-side dimension cut
 * in front of ANN indexing/clustering (shrink 1024-dim to 64-dim before
 * [[graft.operators.Kmeans]]/IVF build); composing it keeps the
 * downstream index build dOut/dIn cheaper with JL-bounded distortion.
 *
 * No reference counterpart (the reference has no vector layer); companion
 * to [[graft.operators.Similarity]].
 */
case class RandomProjectSigns(child: Expression, dOut: Int, scale: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(dOut >= 1 && dOut <= 4096, "need 1 <= dOut <= 4096")
  require(scale >= 1L, "need scale >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "random_project_signs"
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val acc = new Array[Long](dOut)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val q = math.floor(a.getFloat(i).toDouble * scale).toLong
        if (q != 0L) {
          val base = (i + 1).toLong * dOut
          var j = 0
          while (j < dOut) {
            val m = ((base + j) % 999983L) * 2654435761L % 4294967296L
            acc(j) += (if (m < 2147483648L) q else -q)
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val q = ctx.freshName("q")
    val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
    val m = ctx.freshName("m")
    // dOut/scale interpolated as literals (CLAUDE.md Janino rule: no
    // composed-identifier constant declarations).
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        final int $n = ${c.value}.numElements();
        final long[] $acc = new long[$dOut];
        for (int $i = 0; $i < $n; $i++) {
          if (!${c.value}.isNullAt($i)) {
            final long $q = (long) java.lang.Math.floor(
              (double) ${c.value}.getFloat($i) * ${scale}L);
            if ($q != 0L) {
              final long $base = ((long) $i + 1L) * ${dOut}L;
              for (int $j = 0; $j < $dOut; $j++) {
                final long $m = (($base + $j) % 999983L) * 2654435761L % 4294967296L;
                $acc[$j] += ($m < 2147483648L) ? $q : -$q;
              }
            }
          }
        }
        ${ev.isNull} = false;
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($acc);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftRandomProject {
  def project(v: Column, dOut: Int, scale: Long): Column =
    ExpressionUtils.column(RandomProjectSigns(
      ExpressionUtils.expression(v), dOut, scale))
}
