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
 * With a conversion window (`windowUs`), the stage-i+1 event must also
 * land within `windowUs` of that first touch (`t_i < t ≤ t_i + W`) — the
 * report real product analytics runs ("converted within 7 days").
 *
 * 100 TB shape: one slim (user, t) aggregate per stage, each a hash
 * shuffle on the user key — k stages = k bounded shuffles of 16-byte
 * rows, no windows over the whole log, no per-user event collection,
 * nothing on the driver. Each stage's first-touch table is
 * `localCheckpoint`ed before it feeds BOTH the next stage's join and its
 * own output: without the cut, stage k re-executes the full lineage of
 * all prior stages (O(k²) stage work unless exchange reuse happens to
 * fire). The checkpointed tables are one row per surviving user — the
 * natural cost of materializing the funnel frontier; they are freed by
 * session `clearCache` hygiene or block-manager eviction. Timestamps
 * arrive as an integer column (µs — the engine's cross-engine-safe unit
 * for the nanosecond `events.ts`, see graft.queries.T).
 */
object Funnel {

  /** One first-touch table per stage: ("`i`_`type`", (user, __t)) — each
   *  localCheckpoint'ed (lineage cut; see object scaladoc). */
  private def firstTouchTables(
      df: DataFrame, userCol: String, usCol: String, typeCol: String,
      stages: Seq[String], windowUs: Option[Long]): Seq[(String, DataFrame)] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    windowUs.foreach(w => require(w > 0, "need windowUs > 0"))
    var prev: Option[DataFrame] = None
    stages.zipWithIndex.map { case (st, i) =>
      val evs = df.select(col(userCol), col(usCol), col(typeCol))
        .where(col(typeCol) === st)
      val qualifying = prev match {
        case None => evs
        case Some(p) =>
          val after = col(usCol) > col("__t")
          val inWindow = windowUs
            .map(w => col(usCol) <= col("__t") + lit(w))
            .getOrElse(lit(true))
          evs.join(p, Seq(userCol)).where(after && inWindow)
      }
      val firstTouch = qualifying.groupBy(col(userCol))
        .agg(min(col(usCol)).as("__t"))
        .localCheckpoint()
      prev = Some(firstTouch)
      (s"${i + 1}_$st", firstTouch)
    }
  }

  /** (stage, n_users) — one row per funnel stage, stage labelled
   *  "1_<type>", "2_<type>", … in the order given. Strict ordering only;
   *  pass `windowUs` for the conversion-window variant. */
  def report(df: DataFrame, userCol: String, usCol: String,
      typeCol: String, stages: Seq[String],
      windowUs: Option[Long] = None): DataFrame =
    firstTouchTables(df, userCol, usCol, typeCol, stages, windowUs)
      .map { case (label, t) =>
        t.agg(count(lit(1)).as("n_users"))
          .select(lit(label).as("stage"), col("n_users"))
      }
      .reduce(_ unionAll _)

  /** Per-user stage first-touch times in long format — (user, stage,
   *  first_us), one row per (user, reached stage) — the output downstream
   *  joins consume (cohorting, time-to-convert distributions). Same
   *  k-bounded-shuffle shape as [[report]]. */
  def userStages(df: DataFrame, userCol: String, usCol: String,
      typeCol: String, stages: Seq[String],
      windowUs: Option[Long] = None): DataFrame =
    firstTouchTables(df, userCol, usCol, typeCol, stages, windowUs)
      .map { case (label, t) =>
        t.select(col(userCol), lit(label).as("stage"),
          col("__t").cast("long").as("first_us"))
      }
      .reduce(_ unionAll _)
}
