package graft.queries

import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Sessionization queries over `events` (10k events, 150 users at sf0.01).
 * `events.ts` is TIMESTAMP(ns): Spark reads it as a raw nanos long (see
 * `T`), DuckDB compares `epoch_ns(ts)` — identical integer values, no
 * precision trap. Gap = 8h (≈ the median per-user inactivity), giving
 * ~2 events/session on the testdata.
 */
object SessionQueries extends QueryProvider {

  private val GapUs = 8L * 3600 * 1000000L

  /** Microsecond event times on both engines: Spark truncates the raw ns
   *  long (`div 1000`); DuckDB's parquet reader already truncates
   *  TIMESTAMP(NANOS)→µs (verified empirically: floor, not round), so
   *  `epoch_us(ts)` sees the same integers. */
  private def sessions(s: SparkSession, dir: String): DataFrame =
    Sessionize.assign(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", GapUs, "event_id")

  private def sessionize(s: SparkSession, dir: String): DataFrame =
    sessions(s, dir).select(
      col("event_id"), col("user_id"), col("session_seq"))

  private val sessionizeSql =
    s"""SELECT event_id, user_id,
       |  CAST(SUM(CASE WHEN prev IS NULL OR us - prev > $GapUs THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY us, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |FROM (
       |  SELECT event_id, user_id, epoch_us(ts) AS us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events
       |)""".stripMargin

  private def sessionStats(s: SparkSession, dir: String): DataFrame =
    Sessionize.stats(sessions(s, dir), "user_id", "ts_us")
      .select(col("user_id"), col("session_seq"),
        col("n_events"), col("duration").as("duration_us"))

  private val sessionStatsSql =
    s"""WITH s AS (
       |  SELECT user_id, us,
       |    CAST(SUM(CASE WHEN prev IS NULL OR us - prev > $GapUs THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM (
       |    SELECT event_id, user_id, epoch_us(ts) AS us,
       |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |    FROM events
       |  )
       |)
       |SELECT user_id, session_seq, COUNT(*) AS n_events,
       |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
       |FROM s GROUP BY user_id, session_seq""".stripMargin

  // Per-session ordered event paths (Sessionize.sequences): the episode
  // construction — deterministic (us, event_id) order inside each
  // session, string-joined steps. The oracle replays session assignment
  // AND the ordered aggregation (string_agg ORDER BY matches the
  // sort_array total order because event_id is unique).
  private def sessionSeqs(s: SparkSession, dir: String): DataFrame =
    Sessionize.sequences(sessions(s, dir), "user_id", "ts_us",
      "event_id", "event_type")
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("t_start"), col("path"))

  private val sessionSeqsSql =
    s"""WITH s AS (
       |  SELECT user_id, us, event_id, event_type,
       |    CAST(SUM(CASE WHEN prev IS NULL OR us - prev > $GapUs THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM (
       |    SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
       |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |    FROM events
       |  )
       |)
       |SELECT user_id, session_seq, COUNT(*) AS n_events,
       |  CAST(MIN(us) AS BIGINT) AS t_start,
       |  string_agg(event_type, '>' ORDER BY us, event_id) AS path
       |FROM s GROUP BY user_id, session_seq""".stripMargin

  // Ordered-sequence funnel (Funnel.report): view -> click -> purchase,
  // strictly-increasing first-touch times; stage populations are exact
  // integer comparisons on the shared µs timestamps.
  private def funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.report(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase"))

  private val funnelSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
      |), s1 AS (
      |  SELECT user_id, min(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id
      |)
      |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
      |UNION ALL
      |SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
      |UNION ALL
      |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3""".stripMargin

  /**
   * Composition flagship: funnel stage times → exact per-leg latency
   * percentiles. For every fully-converted user (view→click→purchase
   * with strictly increasing first touches), the three leg latencies in
   * µs feed [[graft.operators.Anomaly.quantileReport]]'s order-statistic
   * machinery — the "how long does conversion take" report with P50/P90/
   * P99 that are EXACT, not sketch estimates. The oracle re-derives the
   * funnel, the legs, and every rank pick. 100 TB shape: the funnel
   * reduces the log to one row per converted user before anything else;
   * the quantile pass ranks 3×|converted| slim rows.
   */
  private def funnelLatencyQ(s: SparkSession, dir: String): DataFrame = {
    val st = graft.operators.Funnel.userStages(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type", Seq("view", "click", "purchase"))
    def tcol(label: String, as: String) =
      st.where(col("stage") === label)
        .select(col("user_id"), col("first_us").as(as))
    val j = tcol("1_view", "t1").join(tcol("2_click", "t2"), "user_id")
      .join(tcol("3_purchase", "t3"), "user_id")
    val legs = j.select(col("user_id"), explode(array(
        struct(lit("click_purchase").as("leg"), (col("t3") - col("t2")).as("v")),
        struct(lit("view_click").as("leg"), (col("t2") - col("t1")).as("v")),
        struct(lit("view_purchase").as("leg"), (col("t3") - col("t1")).as("v"))))
        .as("l"))
      .select(col("user_id"), col("l.leg").as("leg"), col("l.v").as("v"))
    graft.operators.Anomaly.quantileReport(legs, "v", "user_id", "leg",
      ppms = Seq(500000L, 900000L, 990000L), scale = 1L)
  }

  private val funnelLatencySql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
      |), s1 AS (
      |  SELECT user_id, min(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id
      |), j AS (
      |  SELECT s1.user_id, t1, t2, t3
      |  FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
      |), legs AS (
      |  SELECT user_id, 'view_click' AS leg, t2 - t1 AS v FROM j
      |  UNION ALL SELECT user_id, 'click_purchase', t3 - t2 FROM j
      |  UNION ALL SELECT user_id, 'view_purchase', t3 - t1 FROM j
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY leg ORDER BY v, user_id) AS r,
      |    count(*) OVER (PARTITION BY leg) AS n
      |  FROM legs WHERE v IS NOT NULL
      |)
      |SELECT leg,
      |  min(CASE WHEN r = (n - 1) * 500000 // 1000000 + 1 THEN v END) AS p50,
      |  min(CASE WHEN r = (n - 1) * 900000 // 1000000 + 1 THEN v END) AS p90,
      |  min(CASE WHEN r = (n - 1) * 990000 // 1000000 + 1 THEN v END) AS p99
      |FROM r GROUP BY 1""".stripMargin

  // Conversion-window funnel: stage i+1 must land within 24h of stage i's
  // first touch — pure integer µs arithmetic on both engines, so the
  // windowed variant is exactly DuckDB-checkable too.
  private val WindowUs = 24L * 3600 * 1000000L

  private def funnelWindowed(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.report(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase"), windowUs = Some(WindowUs))

  private val funnelWindowedSql =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
       |), s1 AS (
       |  SELECT user_id, min(us) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND us > t1 AND us <= t1 + $WindowUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + $WindowUs
       |  GROUP BY e.user_id
       |)
       |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
       |UNION ALL
       |SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
       |UNION ALL
       |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3""".stripMargin

  // Per-user stage first-touch times (windowed) — the long-format output
  // downstream joins consume; every value is an exact integer.
  private def funnelUsers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.userStages(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase"), windowUs = Some(WindowUs))

  private val funnelUsersSql =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
       |), s1 AS (
       |  SELECT user_id, min(us) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND us > t1 AND us <= t1 + $WindowUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + $WindowUs
       |  GROUP BY e.user_id
       |)
       |SELECT user_id, '1_view' AS stage, CAST(t1 AS BIGINT) AS first_us FROM s1
       |UNION ALL
       |SELECT user_id, '2_click', CAST(t2 AS BIGINT) FROM s2
       |UNION ALL
       |SELECT user_id, '3_purchase', CAST(t3 AS BIGINT) FROM s3""".stripMargin

  // Retention cohorts (Sessionize.retentionCohorts): weekly buckets from
  // µs integer division, so the matrix replays exactly in DuckDB (`div`
  // ≡ `//` on non-negative longs).
  private def retention(s: SparkSession, dir: String): DataFrame =
    Sessionize.retentionCohorts(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us")

  private val retentionSql =
    """WITH pb AS (
      |  SELECT DISTINCT user_id AS k, epoch_us(ts) // 604800000000 AS b
      |  FROM events
      |), f AS (SELECT k, min(b) AS b0 FROM pb GROUP BY k)
      |SELECT f.b0 AS cohort_bucket, pb.b - f.b0 AS bucket_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM pb JOIN f ON pb.k = f.k
      |GROUP BY 1, 2""".stripMargin

  /** SCD2 dimension history from the event log: one row per maximal run
   *  of same-type events per user (in (ts, id) order) with half-open
   *  [valid_from_us, valid_to_us) validity — the history-keeping sibling
   *  of q_latest_by_key's CDC upsert. The oracle replays lag →
   *  running-sum → group → lead move-for-move. */
  private def scd2Q(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd.intervals(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type", "event_id")

  private val scd2Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events
      |), m AS (
      |  -- IS DISTINCT FROM mirrors the operator's null-safe <=> change
      |  -- flag: a NULL attr is a value of its own (run boundaries are
      |  -- identical even though the first row's flag differs — the
      |  -- cumulative version ids shift by a constant per key, and only
      |  -- the GROUPING uses them)
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM
      |      event_type THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), v AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS ver
      |  FROM m
      |), g AS (
      |  SELECT user_id, ver, min(event_type) AS event_type,
      |    min(ts_us) AS valid_from_us, count(*) AS n_events
      |  FROM v GROUP BY 1, 2
      |)
      |SELECT user_id, event_type, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver)
      |    AS valid_to_us,
      |  n_events
      |FROM g""".stripMargin

  /** Rolling 7-day active users per event type — the WAU dashboard
   *  number, exact. Distinct-collapse first; the 7× explode multiplies
   *  only the collapsed activity table. */
  private def rollingWauQ(s: SparkSession, dir: String): DataFrame =
    Sessionize.rollingActiveUsers(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_type",
      bucketUs = 86400000000L, windowBuckets = 7)

  private val rollingWauSql =
    """WITH t AS (
      |  SELECT DISTINCT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us, user_id
      |  FROM events
      |), p AS (
      |  SELECT DISTINCT event_type, bucket_us AS target_us FROM t
      |), c AS (
      |  SELECT t.event_type, t.bucket_us + 86400000000 * r.range AS target_us,
      |    t.user_id
      |  FROM t, range(7) r
      |)
      |SELECT c.event_type, c.target_us,
      |  count(DISTINCT c.user_id) AS n_active_users
      |FROM c JOIN p ON c.event_type = p.event_type
      |  AND c.target_us = p.target_us
      |GROUP BY 1, 2""".stripMargin

  /** Daily user acquisition + running user-base size. */
  private def userGrowthQ(s: SparkSession, dir: String): DataFrame =
    Sessionize.userGrowth(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", bucketUs = 86400000000L)

  private val userGrowthSql =
    """WITH f AS (
      |  SELECT user_id,
      |    min(epoch_us(ts) - epoch_us(ts) % 86400000000) AS bucket_us
      |  FROM events GROUP BY 1
      |), p AS (
      |  SELECT bucket_us, count(*) AS n_new_users FROM f GROUP BY 1
      |)
      |SELECT bucket_us, n_new_users,
      |  CAST(sum(n_new_users) OVER (ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum_users
      |FROM p""".stripMargin

  /** First-order Markov transition matrix over per-user event-type
   *  sequences — counts, from-state marginals, and truncated-ppm
   *  probabilities, all integer-exact; the oracle replays the lag
   *  window and both aggregates. |types|² rows. */
  private def transitionQ(s: SparkSession, dir: String): DataFrame =
    Sessionize.transitionMatrix(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_id", "event_type")

  private val transitionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events
      |), p AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS from_type,
      |    event_type AS to_type
      |  FROM e
      |), m AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
      |), g AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM m GROUP BY 1
      |)
      |SELECT m.from_type, m.to_type, m.n, g.n_from,
      |  (m.n * 1000000) // g.n_from AS p_ppm
      |FROM m JOIN g USING (from_type)""".stripMargin

  /** Co-presence mining: pairs of (user, session) intervals that overlap
   *  in time — the interval-overlap join (`IntervalJoin.overlapPairs`,
   *  6 h chunks, canonical-chunk dedup so no distinct). Sessions are cut
   *  at a 30 min gap (tighter than GapUs so the pair space is the
   *  co-activity structure, not one all-day blob); interval ids pack as
   *  `user·2²⁰ + seq`, replayed arithmetically by the oracle. 1479
   *  pairs at sf0.01. */
  private def sessionOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val iv = Sessionize.assign(
        T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", 1800000000L, "event_id")
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("s_us"),
        (max(col("ts_us")) + lit(1L)).as("e_us"))
      .withColumn("iv_id", expr("user_id * 1048576 + session_seq"))
    graft.operators.IntervalJoin.overlapPairs(iv, "iv_id", "s_us", "e_us",
      chunkUs = 21600000000L)
  }

  private val sessionOverlapSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      |), m AS (
      |  SELECT *, lag(us) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS prev
      |  FROM e
      |), sq AS (
      |  SELECT *, CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS seq
      |  FROM m
      |), iv AS (
      |  SELECT user_id * 1048576 + seq AS iv_id,
      |    min(us) AS s, max(us) + 1 AS e
      |  FROM sq GROUP BY user_id, seq
      |)
      |SELECT a.iv_id AS id_a, b.iv_id AS id_b,
      |  greatest(a.s, b.s) AS overlap_start_us,
      |  least(a.e, b.e) AS overlap_end_us,
      |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
      |FROM iv a JOIN iv b
      |  ON a.iv_id < b.iv_id AND a.s < b.e AND b.s < a.e""".stripMargin

  /** Per-transition dwell-time report: exact p50/p95 of the gap between
   *  consecutive events, per (from_type, to_type) — the latency
   *  companion to q_transition_matrix (which edge stalls users). Rides
   *  `Anomaly.quantileReport`'s GlobalSequence ranks (range-spread, no
   *  |types|²-key hot window); the oracle replays the rank formula. */
  private def transitionLatencyQ(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gaps = T(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .where(col("from_type").isNotNull)
      // struct group key, not a delimited string: an event_type
      // containing the delimiter must not mis-split the edge
      .select(struct(col("from_type"), col("to_type")).as("__pair"),
        (col("ts_us") - col("prev_us")).as("gap_us"), col("event_id"))
    graft.operators.Anomaly.quantileReport(gaps, "gap_us", "event_id",
        "__pair", Seq(500000L, 950000L), scale = 1L, withCount = true)
      .select(col("__pair.from_type").as("from_type"),
        col("__pair.to_type").as("to_type"),
        col("n_values"), col("p50"), col("p95"))
  }

  private val transitionLatencySql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events
      |), g AS (
      |  SELECT lag(event_type) OVER w AS from_type, event_type AS to_type,
      |    ts_us - lag(ts_us) OVER w AS gap_us, event_id
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), f AS (SELECT * FROM g WHERE from_type IS NOT NULL),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY from_type, to_type
      |      ORDER BY gap_us, event_id) AS r,
      |    count(*) OVER (PARTITION BY from_type, to_type) AS n
      |  FROM f
      |)
      |SELECT from_type, to_type, CAST(max(n) AS BIGINT) AS n_values,
      |  min(CASE WHEN r = (n - 1) * 500000 // 1000000 + 1
      |    THEN gap_us END) AS p50,
      |  min(CASE WHEN r = (n - 1) * 950000 // 1000000 + 1
      |    THEN gap_us END) AS p95
      |FROM r GROUP BY 1, 2""".stripMargin

  /** The 17th composition flagship: the user-behavior MODEL — one table
   *  per (from, to) transition edge carrying structure (count,
   *  from-marginal, truncated-ppm probability) AND timing (exact
   *  p50/p95 dwell) — what a funnel designer, a next-event predictor,
   *  or a session-shape anomaly monitor actually consumes. Composes
   *  `Sessionize.transitionMatrix` ⨝ the quantileReport dwell table;
   *  the oracle replays both chains and the join, so the hash
   *  certifies the assembled model. */
  private def behaviorModelQ(s: SparkSession, dir: String): DataFrame =
    transitionQ(s, dir).join(
      transitionLatencyQ(s, dir).select(col("from_type"), col("to_type"),
        col("p50").as("p50_gap_us"), col("p95").as("p95_gap_us")),
      Seq("from_type", "to_type"))

  private val behaviorModelSql =
    s"""WITH edges AS (
       |$transitionSql
       |), dwell AS (
       |$transitionLatencySql
       |)
       |SELECT e.from_type, e.to_type, e.n, e.n_from, e.p_ppm,
       |  d.p50 AS p50_gap_us, d.p95 AS p95_gap_us
       |FROM edges e JOIN dwell d USING (from_type, to_type)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_transition_matrix" -> (transitionQ _),
    "q_transition_latency" -> (transitionLatencyQ _),
    "pipeline_behavior_model" -> (behaviorModelQ _),
    "q_session_overlap" -> (sessionOverlapQ _),
    "q_scd2"            -> (scd2Q _),
    "q_rolling_wau"     -> (rollingWauQ _),
    "q_user_growth"     -> (userGrowthQ _),
    "q_sessionize"      -> (sessionize _),
    "q_session_stats"   -> (sessionStats _),
    "q_session_paths"   -> (sessionSeqs _),
    "q_funnel"          -> (funnel _),
    "q_funnel_windowed" -> (funnelWindowed _),
    "q_funnel_users"    -> (funnelUsers _),
    "q_retention"       -> (retention _),
    "pipeline_funnel_latency" -> (funnelLatencyQ _)
  )

  override val oracles: Map[String, String] = Map(
    "q_transition_matrix" -> transitionSql,
    "q_transition_latency" -> transitionLatencySql,
    "pipeline_behavior_model" -> behaviorModelSql,
    "q_session_overlap" -> sessionOverlapSql,
    "q_scd2"            -> scd2Sql,
    "q_rolling_wau"     -> rollingWauSql,
    "q_user_growth"     -> userGrowthSql,
    "q_sessionize"      -> sessionizeSql,
    "q_session_stats"   -> sessionStatsSql,
    "q_session_paths"   -> sessionSeqsSql,
    "q_funnel"          -> funnelSql,
    "q_funnel_windowed" -> funnelWindowedSql,
    "q_funnel_users"    -> funnelUsersSql,
    "q_retention"       -> retentionSql,
    "pipeline_funnel_latency" -> funnelLatencySql
  )
}
