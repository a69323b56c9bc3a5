package graft.operators

import org.apache.spark.sql.{functions => F, DataFrame}

/**
 * Recrawl planning — the step that closes the crawl LIFECYCLE
 * (discover → politeness → fetch → revisit-dedup → RE-crawl): compare
 * what the site declares (sitemap `lastmod`) with what the crawl holds
 * (the fetch log) and decide, per url, whether it is NEW (never
 * fetched), STALE (modified since its last fetch), or FRESH — then
 * pick each host's most-overdue page as the next recrawl candidate,
 * since politeness budgets are spent per host.
 *
 * 100 TB shape: one url-keyed FULL OUTER join between two slim
 * (url, ts) tables — both orders of magnitude smaller than the corpus
 * (one row per url, not per capture; callers pre-compact the fetch log
 * with latest-by-key, which `q_latest_by_key` already certifies) —
 * then one host-keyed aggregate with map-side partials and a
 * `max_by` candidate pick (no window, no single-partition stage). No
 * broadcast hints: both sides are real tables, AQE decides.
 *
 * Reference has no crawl surface (north-star addition; the planning
 * complement of `StreamingLens.frontierSchedule`'s politeness ledger).
 */
object Recrawl {

  /** Per-url staleness: `declared` = (urlCol, lastmodMsCol) from
   *  sitemaps, `fetched` = (urlCol, fetchMsCol) last-fetch times.
   *  Output: url, host, lastmod_ms (-1 = not declared), fetch_ms (-1 =
   *  never fetched), status ∈ {new, stale, fresh, undeclared},
   *  overdue_ms (lastmod - fetch for stale, lastmod for new, else 0 —
   *  the priority an operator ranks by). */
  def staleness(declared: DataFrame, urlCol: String, lastmodMsCol: String,
      fetched: DataFrame, fetchMsCol: String): DataFrame = {
    val d = declared.select(F.col(urlCol).as("url"),
      F.col(lastmodMsCol).as("__lm"))
    val f = fetched.select(F.col(urlCol).as("url"),
      F.col(fetchMsCol).as("__ft"))
    d.join(f, Seq("url"), "full_outer")
      .select(
        F.col("url"),
        F.regexp_extract(F.col("url"), "https?://([^/]+)/", 1).as("host"),
        F.coalesce(F.col("__lm"), F.lit(-1L)).as("lastmod_ms"),
        F.coalesce(F.col("__ft"), F.lit(-1L)).as("fetch_ms"))
      .withColumn("status",
        F.when(F.col("fetch_ms") < 0L, F.lit("new"))
          .when(F.col("lastmod_ms") < 0L, F.lit("undeclared"))
          .when(F.col("lastmod_ms") > F.col("fetch_ms"), F.lit("stale"))
          .otherwise(F.lit("fresh")))
      .withColumn("overdue_ms",
        F.when(F.col("status") === "stale",
          F.col("lastmod_ms") - F.col("fetch_ms"))
          .when(F.col("status") === "new", F.col("lastmod_ms"))
          .otherwise(F.lit(0L)))
  }

  /** Roll [[staleness]] up per host and pick the single most-overdue
   *  recrawl candidate (max overdue, url tiebreak — deterministic):
   *  host, n_urls, n_new, n_stale, n_fresh, n_undeclared,
   *  recrawl_url ("" when nothing is due), recrawl_overdue_ms. */
  def plan(staleness: DataFrame): DataFrame =
    staleness.groupBy(F.col("host")).agg(
      F.count(F.lit(1)).as("n_urls"),
      F.sum(F.when(F.col("status") === "new", 1L).otherwise(0L))
        .as("n_new"),
      F.sum(F.when(F.col("status") === "stale", 1L).otherwise(0L))
        .as("n_stale"),
      F.sum(F.when(F.col("status") === "fresh", 1L).otherwise(0L))
        .as("n_fresh"),
      F.sum(F.when(F.col("status") === "undeclared", 1L).otherwise(0L))
        .as("n_undeclared"),
      F.max(F.when(F.col("overdue_ms") > 0L,
        F.struct(F.col("overdue_ms"), F.col("url")))).as("__pick"))
      .withColumn("recrawl_url",
        F.coalesce(F.col("__pick").getField("url"), F.lit("")))
      .withColumn("recrawl_overdue_ms",
        F.coalesce(F.col("__pick").getField("overdue_ms"), F.lit(0L)))
      .drop("__pick")
}
