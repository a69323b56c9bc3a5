package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-signal rank-ensemble scoring — the "combine weak quality
 * classifiers" step of modern corpus curation (FineWeb-style pipelines
 * vote several cheap heuristics instead of trusting one): each signal is
 * reduced to its global rank over the scored set (1 = worst, ascending —
 * callers flip lower-is-better signals into a higher-is-better form
 * first, e.g. dup_ratio → distinct ratio), ranks are summed, and the
 * caller cuts the top of the rank-sum order. Rank (Borda) aggregation is
 * scale-free: signals in incomparable units — an IEEE quality score,
 * integer micro-nats, a shingle ratio — combine without normalization
 * constants, outliers can't dominate, and the result is integer-exact
 * cross-engine: each rank is a row_number over the total order
 * (signal, id), so the whole ensemble — including every tie-break —
 * replays bit-identically in any engine that can sort.
 *
 * Not in the reference (no multi-signal surface); SURVEY.md §2.6
 * north-star addition.
 *
 * 100 TB shape: one slim (id, signal) [[GlobalSequence]] range-partition
 * rank per signal — two fully-parallel passes each, no single-partition
 * window — then id-keyed joins of the rank columns (8-byte keys, ≤
 * #signals joins). Nothing document-shaped moves after the signal scan;
 * the downstream top-k cut is a TakeOrdered (per-partition heaps).
 */
object Ensemble {

  /** (idCol, rank_<signal>..., rank_sum) — ascending ranks per signal
   *  (1 = worst) over `scored`'s rows, summed. Every `signalCols` entry
   *  must be orderable; higher = better for all of them. */
  def rankSum(scored: DataFrame, idCol: String,
      signalCols: Seq[String]): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal column")
    require(signalCols == signalCols.distinct, "signal columns must be distinct")
    signalCols.map { sc =>
      GlobalSequence.withSequentialId(
        scored.select(col(idCol), col(sc)),
        struct(col(sc), col(idCol)), s"rank_$sc")
        .select(col(idCol), col(s"rank_$sc"))
    }.reduce(_.join(_, Seq(idCol)))
      .withColumn("rank_sum",
        signalCols.map(sc => col(s"rank_$sc")).reduce(_ + _))
  }
}
