package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton) clustering layout — the multi-dimensional data-skipping
 * lever (Delta/Iceberg `OPTIMIZE ZORDER BY`, Morton 1966): rows sorted by
 * the bit-interleave of their per-dimension ranks land so that file-level
 * min/max statistics prune BOTH dimensions, instead of one dimension
 * perfectly and the other not at all (a plain compound sort's failure
 * mode). Not in the reference (no storage layout surface); SURVEY.md §2.6
 * physical-layout addition alongside bucketing and the md5 training order.
 *
 * Everything is integer-exact and engine-portable: dimension values map
 * to 0-based dense ranks over the total order (dim, id) — scale-free
 * across incomparable units, same trick as [[Ensemble.rankSum]] — and the
 * interleave is five shift-or-mask spreads replayable verbatim in any
 * engine with 64-bit integers (the DuckDB oracle runs the same fold as a
 * CTE chain).
 *
 * 100 TB shape: two `GlobalSequence` range-partition rank passes + one
 * final range partition by z — three slim shuffles of (id, rank) pairs;
 * payloads never move (callers join the (id, pos) layout back, or write
 * with `repartitionByRange(pos)`). No single-partition window anywhere.
 */
object Layout {

  /** (shift, mask) spread steps — masks are 0x0000FFFF0000FFFF,
   *  0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F, 0x3333333333333333,
   *  0x5555555555555555 in decimal (kept decimal so the oracle SQL uses
   *  the same literals). */
  private[graft] val spreadSteps: Seq[(Int, Long)] = Seq(
    (16, 281470681808895L),
    (8, 71777214294589695L),
    (4, 1085102592571150095L),
    (2, 3689348814741910323L),
    (1, 6148914691236517205L))

  /** Spread the low 32 bits of a non-negative long into the even bit
   *  positions (the Morton interleave half). */
  def spreadBits(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(4294967295L))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** The 64-bit Morton code of two 32-bit coordinates: bit i of `a` lands
   *  at 2i, bit i of `b` at 2i+1. */
  def morton(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** (idCol, zval, pos): the Z-order layout of `df` over two dimensions.
   *  Ranks are dense 0-based over the total orders (dimA, id) / (dimB,
   *  id); `pos` is the 1-based write position over (zval, id). Ties in a
   *  dimension break by id, so the layout is rerun-deterministic. */
  def zorderLayout(df: DataFrame, idCol: String, dimA: String,
      dimB: String): DataFrame = {
    val id = col(idCol)
    val ra = GlobalSequence.withSequentialId(
      df.select(id, col(dimA)), struct(col(dimA), id), "ra")
      .select(id, (col("ra") - 1).as("ra"))
    val rb = GlobalSequence.withSequentialId(
      df.select(id, col(dimB)), struct(col(dimB), id), "rb")
      .select(id, (col("rb") - 1).as("rb"))
    val z = ra.join(rb, Seq(idCol))
      .select(id, morton(col("ra"), col("rb")).as("zval"))
    GlobalSequence.withSequentialId(z, struct(col("zval"), id), "pos")
  }
}
