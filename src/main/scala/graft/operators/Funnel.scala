package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-sequence funnel analysis over an event log — "how many users
 * did A, then B strictly after, then C strictly after" (SURVEY.md §2.5
 * class: absent in the reference, supplied Spark-first). The standard
 * product-analytics report and, in a training-data pipeline, the shape
 * of multi-step interaction mining over event streams.
 *
 * Semantics: stage i+1 counts a user iff an event of stage i+1's type
 * occurs STRICTLY after the user's earliest qualifying stage-i event
 * (first-touch attribution; a click before any view does not qualify).
 *
 * 100 TB shape: one slim (user, t) aggregate per stage, each a hash
 * shuffle on the user key that AQE/exchange-reuse co-partitions with the
 * next stage's join — k stages = k bounded shuffles of 16-byte rows, no
 * windows over the whole log, no per-user event collection, nothing on
 * the driver. Timestamps arrive as an integer column (µs — the engine's
 * cross-engine-safe unit for the nanosecond `events.ts`, see
 * graft.queries.T).
 */
object Funnel {

  /** (stage, n_users) — one row per funnel stage, stage labelled
   *  "1_<type>", "2_<type>", … in the order given. */
  def report(df: DataFrame, userCol: String, usCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    var prev: Option[DataFrame] = None
    val counts = stages.zipWithIndex.map { case (st, i) =>
      val evs = df.select(col(userCol), col(usCol), col(typeCol))
        .where(col(typeCol) === st)
      val qualifying = prev match {
        case None => evs
        case Some(p) => evs.join(p, Seq(userCol)).where(col(usCol) > col("__t"))
      }
      val firstTouch = qualifying.groupBy(col(userCol))
        .agg(min(col(usCol)).as("__t"))
      prev = Some(firstTouch)
      firstTouch.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$st").as("stage"), col("n_users"))
    }
    counts.reduce(_ unionAll _)
  }
}
