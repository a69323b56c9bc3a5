package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sessionization: split each key's event stream into sessions at
 * inactivity gaps — the standard log-preparation step for training-data
 * pipelines (conversation/episode construction).
 *
 * Scale shape: one window partitioned BY KEY (never a global window) —
 * the shuffle is the same hash-by-key exchange a groupBy would do, state
 * per task is one partition's rows, and skewed keys are bounded by the
 * per-user event count, not corpus size. Batch here; the streaming
 * equivalent is `StreamingLens.eventWindowAgg` / session windows with
 * watermark state.
 *
 * The reference has no event-time semantics at all (its pull stream is
 * order-only — SURVEY.md §2.5); this is a §2.6 north-star addition.
 */
object Sessionize {

  /**
   * Assign a per-key 1-based session index. A new session starts at the
   * first event of a key or when the gap from the previous event exceeds
   * `gap` (same units as `tsCol` — ns for the testdata `events.ts`).
   * `tieCol` breaks equal-timestamp ordering deterministically.
   */
  def assign(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Long,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession: Column =
      when(prev.isNull || (col(tsCol) - prev) > gap, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates: event count and exact duration (ts units). */
  def stats(
      sessions: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame =
    sessions
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))

  /**
   * Per-session ordered event path — the episode/trajectory construction
   * a behavior model trains on ("view>click>purchase"), and the batch
   * complement of the streaming per-key sequence state
   * ([[graft.streaming.StreamingLens]] `flatMapGroupsWithState`). For
   * every (key, session): event count, start time, and the step column's
   * values joined in event order. Ordering is the total order
   * (ts, tie) — `sort_array` over collected (ts, tie, step) structs
   * (struct comparison is lexicographic), so the path is deterministic
   * under equal timestamps and NEEDS no second window pass.
   *
   * 100 TB shape: one hash exchange keyed (key, session) with map-side
   * partial collect; per-group state is one session's events — bounded
   * by per-user activity within one gap window, never a log-wide sort.
   */
  def sequences(sessions: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stepCol: String, sep: String = ">"): DataFrame =
    sessions.groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        array_join(transform(
          sort_array(collect_list(
            struct(col(tsCol), col(tieCol), col(stepCol)))),
          s => s.getField(stepCol)), sep).as("path"))

  /**
   * Retention cohort matrix — the product-analytics companion of the
   * funnel: users grouped by their first-activity bucket (cohort), each
   * later-active bucket counted at its offset. `(cohort_bucket,
   * bucket_offset, n_users)` with integer bucket ids (`ts div bucketUs`,
   * default one week), so the whole matrix replays bit-exactly
   * cross-engine.
   *
   * 100 TB shape: the log collapses to DISTINCT (user, bucket) inside
   * the first aggregate — after that everything is bounded by
   * |users| × |buckets|, never event volume. One distinct aggregate, one
   * per-user min, one slim user-keyed join, one count — no windows.
   */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      bucketUs: Long = 7L * 86400 * 1000000L): DataFrame = {
    val perBucket = events
      .select(col(keyCol).as("k"), expr(s"$tsCol div $bucketUs").as("b"))
      .distinct()
    val first = perBucket.groupBy(col("k")).agg(min(col("b")).as("b0"))
    perBucket.join(first, Seq("k"))
      .select(col("b0").as("cohort_bucket"),
        (col("b") - col("b0")).as("bucket_offset"))
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * User growth curve — the acquisition dashboard: per time bucket, how
   * many users appeared for the FIRST time, and the running total (the
   * user-base size). The user-dimension sibling of `text_vocab_growth`'s
   * first-seen token counts. Cumulative new-user counts are exactly the
   * distinct-user count of the log's prefix, so the curve doubles as an
   * exact "users to date" series.
   *
   * 100 TB shape: the log collapses to one (user, first_bucket) row per
   * user in the first aggregate (partial min), then to one row per
   * bucket; the running-total window runs over the BUCKET table — its
   * cardinality is the time span in buckets, never users or events, so
   * the unpartitioned window is a deliberate non-issue (same argument
   * as `q_rolling_7d`'s day-keyed frame).
   */
  def userGrowth(events: DataFrame, userCol: String, tsUsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.expressions.Window
    val firstSeen = events.select(col(userCol).as("__u"),
        (col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs))).as("__b"))
      .groupBy(col("__u")).agg(min(col("__b")).as("bucket_us"))
    firstSeen.groupBy(col("bucket_us"))
      .agg(count(lit(1)).as("n_new_users"))
      .withColumn("n_cum_users",
        sum(col("n_new_users")).over(Window.orderBy(col("bucket_us"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * First-order Markov transition matrix over the event-type sequence —
   * the behavior model a funnel designer reads before hard-coding stage
   * lists, and the base table for next-event prediction / anomaly
   * scoring of session shapes. Per user (in (ts, id) total order) each
   * consecutive event pair contributes one (from_type, to_type)
   * transition; output per observed pair: the transition count `n`, the
   * from-state marginal `n_from`, and the integer-exact probability
   * `p_ppm = n·10⁶ div n_from` (non-negative operands — Spark DIV ≡
   * DuckDB //). Σ_to p_ppm ≤ 10⁶ per from-state (truncation, never
   * rounding up) — the spec pins both the counts and that bound.
   *
   * 100 TB shape: rows slim to (user, ts, id, type) before ONE
   * user-hash exchange; the lag window's state is a single row; pairs
   * partial-aggregate map-side to the |types|² matrix, and the marginal
   * re-aggregates FROM the matrix (never a second pass over events).
   */
  def transitionMatrix(events: DataFrame, userCol: String, tsUsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsUsCol), col(idCol),
        col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |types|² rows, referenced twice: never re-run
      //                    the event-log window per reference
    val marginal = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(marginal, Seq("from_type"))
      .withColumn("p_ppm", expr("(n * 1000000) div n_from"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        col("p_ppm"))
  }

  /**
   * Rolling active users (the WAU/MAU dashboard number): for every
   * (group, bucket) PRESENT in the log, the count of distinct users
   * active in the trailing `windowBuckets` buckets ending there — e.g.
   * day buckets + windowBuckets=7 is classic rolling-7-day actives per
   * event type. Exact distinct (the certified-sketch swap at corpus
   * scale is `approx_count_distinct`, the `dedup_approx_verify`
   * discipline).
   *
   * 100 TB shape: the log collapses to DISTINCT (group, bucket, user)
   * FIRST — everything after is activity volume, never event volume.
   * Each activity triple then serves its `windowBuckets` target buckets
   * via a map-side explode of the COLLAPSED table (a generator of long
   * offsets — no window functions, no range self-join of the log), a
   * left-semi keep against the present-bucket list, and one
   * count-distinct aggregate of slim (group, target, user) rows.
   */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsUsCol: String,
      groupCol: String, bucketUs: Long, windowBuckets: Int): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(windowBuckets >= 1, "windowBuckets must be >= 1")
    val triples = events.select(col(groupCol),
        (col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs))).as("bucket_us"),
        col(userCol).as("__u"))
      .distinct()
    val present = triples.select(col(groupCol), col("bucket_us")).distinct()
      .withColumnRenamed("bucket_us", "target_us")
    val contrib = triples
      .withColumn("__t", explode(sequence(lit(0L), lit(windowBuckets - 1L))))
      .select(col(groupCol),
        (col("bucket_us") + col("__t") * lit(bucketUs)).as("target_us"),
        col("__u"))
    contrib.join(present, Seq(groupCol, "target_us"), "left_semi")
      .groupBy(col(groupCol), col("target_us"))
      .agg(count_distinct(col("__u")).as("n_active_users"))
  }
}
