package graft.queries

import graft.operators.Anomaly
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Pipeline-monitoring queries over `events`: integer-exact z-score
 * anomaly detection ([[graft.operators.Anomaly]]). Both queries clear
 * the z-test of division and sqrt — `(v·n − s)²·kDen² > kNum²·(n·q − s²)`
 * over per-row integer-floored values — so Spark (DECIMAL(38,0)) and
 * DuckDB (HUGEINT) agree on every row with no FP boundary risk.
 */
object AnomalyQueries extends QueryProvider {

  /** Row-level 3σ value outliers per event type. `value` is
   *  exponential-ish (mean ≈ σ ≈ 50, max ≈ 9σ), so the 3σ tail is
   *  populated at every sf (~1.9% of rows). */
  private def eventOutliers(s: SparkSession, dir: String): DataFrame =
    Anomaly.zscoreOutliers(T(s, dir, "events"), "value", "event_type",
        kNum = 3, kDen = 1, scale = 1000L)
      .where(col("is_outlier"))
      .select(col("event_id"), col("event_type"),
        col("value_int").as("value_milli"))

  private val eventOutliersSql =
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000) AS BIGINT) AS value_milli
      |  FROM events
      |), s AS (
      |  SELECT event_type, count(*) AS n, sum(value_milli) AS sm,
      |         sum(value_milli * value_milli) AS sq
      |  FROM v GROUP BY 1
      |)
      |SELECT v.event_id, v.event_type, v.value_milli
      |FROM v JOIN s USING (event_type)
      |WHERE (v.value_milli::HUGEINT * s.n - s.sm)
      |      * (v.value_milli::HUGEINT * s.n - s.sm)
      |      > 9 * (s.n::HUGEINT * s.sq - s.sm::HUGEINT * s.sm)""".stripMargin

  /** Ingest-volume spike detection: day × type counts, each day tested
   *  at 2.5σ against its type's own daily history. The count table
   *  (days × types, never event volume) is all that shuffles. */
  private def dailySpikes(s: SparkSession, dir: String): DataFrame =
    Anomaly.volumeSpikes(
        T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "ts_us", "event_type",
        bucketUs = 86400000000L, kNum = 5, kDen = 2)
      .where(col("is_outlier"))
      .select(col("event_type"), col("bucket_us"), col("n_events"))

  private val dailySpikesSql =
    """WITH d AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, count(*) AS nb, sum(n_events) AS sm,
      |         sum(n_events * n_events) AS sq
      |  FROM d GROUP BY 1
      |)
      |SELECT d.event_type, d.bucket_us, d.n_events
      |FROM d JOIN s USING (event_type)
      |WHERE (d.n_events::HUGEINT * s.nb - s.sm)
      |      * (d.n_events::HUGEINT * s.nb - s.sm) * 4
      |      > 25 * (s.nb::HUGEINT * s.sq - s.sm::HUGEINT * s.sm)""".stripMargin

  /** Seasonal ingest monitoring: hour × type counts, each tested at 2.5σ
   *  against the SAME HOUR-OF-DAY's history for that type — the
   *  diurnal-aware monitor (a night-hours burst that never reaches the
   *  daily peak is masked in q_daily_spikes's whole-history variance but
   *  flagged here). 50 rows at sf0.01. */
  private def seasonalSpikes(s: SparkSession, dir: String): DataFrame =
    Anomaly.seasonalSpikes(
        T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "ts_us", "event_type",
        bucketUs = 3600000000L, periodBuckets = 24, kNum = 5, kDen = 2)
      .where(col("is_outlier"))
      .select(col("event_type"), col("phase"), col("bucket_us"),
        col("n_events"))

  private val seasonalSpikesSql =
    """WITH d AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), p AS (
      |  SELECT event_type, bucket_us, n_events,
      |    (bucket_us // 3600000000) % 24 AS phase
      |  FROM d
      |), s AS (
      |  SELECT event_type, phase, count(*) AS nb, sum(n_events) AS sm,
      |         sum(n_events * n_events) AS sq
      |  FROM p GROUP BY 1, 2
      |)
      |SELECT p.event_type, p.phase, p.bucket_us, p.n_events
      |FROM p JOIN s USING (event_type, phase)
      |WHERE (p.n_events::HUGEINT * s.nb - s.sm)
      |      * (p.n_events::HUGEINT * s.nb - s.sm) * 4
      |      > 25 * (s.nb::HUGEINT * s.sq - s.sm::HUGEINT * s.sm)""".stripMargin

  /** Quantity-weighted median price per return flag — the lower weighted
   *  median (smallest v with 2·cumw ≥ W), integer-exact; rows collapse
   *  to per-value weight sums before any window. */
  private def weightedMedianQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.weightedMedian(T(s, dir, "lineitem"),
      "l_extendedprice", "l_quantity", "l_returnflag", scale = 1000L)

  private val weightedMedianSql =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_extendedprice * 1000) AS BIGINT) AS v,
      |    CAST(floor(l_quantity) AS BIGINT) AS w
      |  FROM lineitem
      |), pv AS (
      |  SELECT l_returnflag, v, sum(w) AS wv FROM s GROUP BY 1, 2
      |), t AS (
      |  SELECT l_returnflag, CAST(sum(wv) AS BIGINT) AS w_total
      |  FROM pv GROUP BY 1
      |), c AS (
      |  SELECT l_returnflag, v,
      |    CAST(sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
      |  FROM pv
      |)
      |SELECT c.l_returnflag, t.w_total, min(c.v) AS wmedian_units
      |FROM c JOIN t USING (l_returnflag)
      |WHERE c.cumw * 2 >= t.w_total
      |GROUP BY 1, 2""".stripMargin

  /** Robust outliers: modified z-score at 3.5 over median/MAD order
   *  statistics — integer-exact end to end (medians are data elements). */
  private def eventMad(s: SparkSession, dir: String): DataFrame =
    Anomaly.madOutliers(T(s, dir, "events"), "value", "event_type",
        kNum = 7000, kDen = 1349, scale = 1000L)
      .where(col("is_outlier"))
      .select(col("event_id"), col("event_type"),
        col("value_int").as("value_milli"),
        col("median_int").as("median_milli"), col("mad_int").as("mad_milli"))

  private val eventMadSql =
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000) AS BIGINT) AS vm
      |  FROM events
      |), m AS (
      |  SELECT event_type, quantile_disc(vm, 0.5) AS med FROM v GROUP BY 1
      |), d AS (
      |  SELECT v.event_id, v.event_type, v.vm, m.med,
      |    abs(v.vm - m.med) AS adev
      |  FROM v JOIN m USING (event_type)
      |), md AS (
      |  SELECT event_type, quantile_disc(adev, 0.5) AS mad FROM d GROUP BY 1
      |)
      |SELECT d.event_id, d.event_type, d.vm AS value_milli,
      |  d.med AS median_milli, md.mad AS mad_milli
      |FROM d JOIN md USING (event_type)
      |WHERE d.adev * 1349 > 7000 * md.mad""".stripMargin

  // Per-user EWMA of event values in integer cents (Anomaly.ewmaByKey,
  // smoothing 1/4): the oracle replays each user's whole fold with
  // list_reduce over the (ts, id)-ordered prefix — quadratic per user at
  // oracle scale, sequential-exact on the Spark side.
  private def ewmaQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.ewmaByKey(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "value", num = 1, den = 4, idCol = "event_id")

  private val ewmaSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(floor(value * 100) AS BIGINT) AS v
      |  FROM events
      |), l AS (
      |  SELECT user_id,
      |    list(struct_pack(us := us, eid := event_id, v := v)
      |      ORDER BY us, event_id) AS evs
      |  FROM e GROUP BY user_id
      |), idx AS (
      |  SELECT user_id, evs, unnest(range(1, len(evs) + 1)) AS i FROM l
      |)
      |SELECT user_id, evs[i].eid AS event_id, evs[i].v AS v,
      |  CAST(list_reduce(list_transform(evs[1:i], x -> x.v),
      |    (a, b) -> (3 * a + b) // 4) AS BIGINT) AS ewma
      |FROM idx""".stripMargin

  /** Exact per-type [p1, p99] winsorization of `value` — the treatment
   *  companion of the outlier detectors: order-statistic bounds, BIGINT
   *  clip, every row replayed by the oracle. */
  private def winsorizeQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.winsorize(T(s, dir, "events"), "value", "event_id",
        "event_type", pLoPpm = 10000L, pHiPpm = 990000L, scale = 1000L)
      .select(col("event_id"), col("event_type"),
        col("v").as("value_milli"), col("v_clipped").as("value_clipped"))

  private val winsorizeSql =
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS r,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v
      |), b AS (
      |  SELECT event_type,
      |    min(CASE WHEN r = (n - 1) * 10000 // 1000000 + 1 THEN v END) AS lo_v,
      |    max(CASE WHEN r = (n - 1) * 990000 // 1000000 + 1 THEN v END) AS hi_v
      |  FROM r GROUP BY 1
      |)
      |SELECT v.event_id, v.event_type, v.v AS value_milli,
      |  greatest(least(v.v, b.hi_v), b.lo_v) AS value_clipped
      |FROM v JOIN b USING (event_type)""".stripMargin

  /**
   * 7-day trailing moving average of daily event volume per type — the
   * time-series smoothing every ops dashboard draws, integer-exact
   * (`sum·1000 DIV count` over the trailing RANGE frame, non-negative
   * so Spark DIV ≡ DuckDB //). 100 TB shape: the log collapses to
   * (type, day) counts FIRST, so the per-type window ranks
   * types × days rows — never event volume — and the frame is a range
   * over integer day keys, identical semantics in both engines.
   */
  private def rolling7dQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = T(s, dir, "events")
      .select(col("event_type"), expr("ts div 1000 div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    d.withColumn("sum7", sum(col("n")).over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .select(col("event_type"), col("day"), col("n"),
        expr("CAST(sum7 * 1000 DIV cnt7 AS BIGINT)").as("avg7_milli"))
  }

  private val rolling7dSql =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, day, n,
      |  CAST(sum(n) OVER w * 1000 // count(*) OVER w AS BIGINT) AS avg7_milli
      |FROM d
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /**
   * Calendar-gap detection — HOURS with zero events per type inside the
   * type's own [first, last] hour span: the data-completeness monitor
   * that catches a silently-dead ingest feed (volume spikes flag
   * too-much; this flags missing-entirely). Hour granularity because the
   * synthetic log has no day-level gaps (215 hour gaps at sf0.01 — the
   * verdict is populated). 100 TB shape: the log collapses to DISTINCT
   * (type, hour) first; the calendar explode is span-bounded
   * (types × hours), and the anti-join moves only those slim rows.
   */
  private def missingDaysQ(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "events")
      .select(col("event_type"), expr("ts div 1000 div 3600000000").as("hr"))
      .distinct()
    val span = d.groupBy(col("event_type"))
      .agg(min(col("hr")).as("d0"), max(col("hr")).as("d1"))
    span.select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("hr"))
      .join(d, Seq("event_type", "hr"), "left_anti")
  }

  private val missingDaysSql =
    """WITH d AS (
      |  SELECT DISTINCT event_type,
      |    epoch_us(ts) // 3600000000 AS hr
      |  FROM events
      |), s AS (
      |  SELECT event_type, min(hr) AS d0, max(hr) AS d1 FROM d GROUP BY 1
      |), a AS (
      |  SELECT event_type, unnest(range(d0, d1 + 1)) AS hr FROM s
      |)
      |SELECT a.event_type, a.hr
      |FROM a LEFT JOIN d ON a.event_type = d.event_type AND a.hr = d.hr
      |WHERE d.hr IS NULL""".stripMargin

  /** Exact per-type P50/P95/P99 of `value` in milli units — the latency-
   *  report shape, order statistics replayed row-for-row by the oracle. */
  private def percentilesQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.quantileReport(T(s, dir, "events"), "value", "event_id",
      "event_type", ppms = Seq(500000L, 950000L, 990000L), scale = 1000L)

  private val percentilesSql =
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS r,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v
      |)
      |SELECT event_type,
      |  min(CASE WHEN r = (n - 1) * 500000 // 1000000 + 1 THEN v END) AS p50,
      |  min(CASE WHEN r = (n - 1) * 950000 // 1000000 + 1 THEN v END) AS p95,
      |  min(CASE WHEN r = (n - 1) * 990000 // 1000000 + 1 THEN v END) AS p99
      |FROM r GROUP BY 1""".stripMargin

  /** CUSUM level-shift monitor per event type over daily value sums —
   *  Page's statistic in its two-window closed form (`S_t = C_t −
   *  min(0, min prefix C)`), integer-exact after the group-min shift, so
   *  the oracle replays running-sum + running-min window-for-window.
   *  150 rows (type × day) at sf0.01. */
  private def cusumQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.cusum(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "ts_us", "event_type", "value",
      bucketUs = 86400000000L, scale = 1000L,
      slackPpm = 100000L, hPpm = 500000L)

  private val cusumSql =
    """WITH b AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, min(x) AS lo, CAST(sum(x) AS BIGINT) AS tot,
      |    count(*) AS n
      |  FROM b GROUP BY 1
      |), d AS (
      |  SELECT b.event_type, b.bucket_us, b.x - s.lo AS x_scaled,
      |    (s.tot - s.n * s.lo) // s.n AS mu
      |  FROM b JOIN s USING (event_type)
      |), c AS (
      |  SELECT *, CAST(sum(x_scaled - mu - (mu * 100000) // 1000000)
      |      OVER w AS BIGINT) AS cum
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING)
      |)
      |SELECT event_type, bucket_us, x_scaled,
      |  cum - least(0, min(cum) OVER w) AS cusum,
      |  cum - least(0, min(cum) OVER w) > (mu * 500000) // 1000000
      |    AS is_alarm
      |FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |  ROWS UNBOUNDED PRECEDING)""".stripMargin

  /** Dense hourly series per event type with LOCF gap-fill — the repair
   *  verb for q_missing_hours' audit (215 of 3600 hours are gaps at
   *  sf0.01). The fill-group trick (count(x) OVER increments only at
   *  observed rows; max within (group, fill_grp) broadcasts the carried
   *  value) replays in DuckDB with the same two windows. */
  private def gapFillQ(s: SparkSession, dir: String): DataFrame =
    Anomaly.gapFill(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "ts_us", "event_type", "value",
      bucketUs = 3600000000L, scale = 1000L)

  private val gapFillSql =
    """WITH b AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
      |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
      |  FROM b GROUP BY 1
      |), cal AS (
      |  SELECT event_type,
      |    unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
      |  FROM s
      |), j AS (
      |  SELECT cal.event_type, cal.bucket_us, b.x
      |  FROM cal LEFT JOIN b USING (event_type, bucket_us)
      |), f AS (
      |  SELECT *, count(x) OVER (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING) AS fg
      |  FROM j
      |)
      |SELECT event_type, bucket_us,
      |  max(x) OVER (PARTITION BY event_type, fg) AS x_filled,
      |  x IS NULL AS is_gap
      |FROM f""".stripMargin

  /** Pinned-target CUSUM alarms over hourly value sums — the production
   *  calibrated form (`Anomaly.cusumWithTarget`, the math the streaming
   *  `cusumGate` replays): target 160000 / allowance 16000 / threshold
   *  800000 milli-units from an offline window. 204 alarm rows at
   *  sf0.01. */
  private def cusumPinnedQ(s: SparkSession, dir: String): DataFrame = {
    val buckets = T(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("bucket_us", expr("ts_us - pmod(ts_us, 3600000000)"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(sum(floor(col("value") * 1000).cast("long")).as("__x"))
    Anomaly.cusumWithTarget(buckets, "event_type", "__x",
        target = 160000L, allowance = 16000L, threshold = 800000L)
      .where(col("is_alarm"))
      .select(col("event_type"), col("bucket_us"), col("x_scaled"),
        col("cusum"))
  }

  private val cusumPinnedSql =
    """WITH b AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
      |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
      |      AS x_scaled
      |  FROM events GROUP BY 1, 2
      |), c AS (
      |  SELECT *, CAST(sum(x_scaled - 160000 - 16000) OVER w AS BIGINT)
      |    AS cum
      |  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING)
      |), s AS (
      |  SELECT *, cum - least(0, min(cum) OVER w) AS cusum
      |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING)
      |)
      |SELECT event_type, bucket_us, x_scaled, cusum
      |FROM s WHERE cusum > 800000""".stripMargin

  /** The 16th composition flagship: the QUALITY-WATCH monitor a
   *  production ingest runs — gap-fill the hourly value series to a
   *  dense calendar (LOCF through the 215 missing hours, so the
   *  statistic never silently skips a dead hour) and run the pinned
   *  pinned-target CUSUM over the FILLED series; alarm rows keep the
   *  is_gap flag (an alarm on a carried-forward hour is a "still
   *  elevated during an outage" signal). Every stage is two plain
   *  windows — the oracle replays fill-group LOCF and both CUSUM
   *  windows move-for-move, so the hash certifies the whole
   *  composition. */
  private def qualityWatchQ(s: SparkSession, dir: String): DataFrame = {
    val filled = Anomaly.gapFill(
      T(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
      "ts_us", "event_type", "value",
      bucketUs = 3600000000L, scale = 1000L)
    Anomaly.cusumWithTarget(filled, "event_type", "x_filled",
        target = 160000L, allowance = 16000L, threshold = 800000L)
      .where(col("is_alarm"))
      .select(col("event_type"), col("bucket_us"), col("x_scaled"),
        col("is_gap"), col("cusum"))
  }

  private val qualityWatchSql =
    """WITH b AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
      |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
      |  FROM b GROUP BY 1
      |), cal AS (
      |  SELECT event_type,
      |    unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
      |  FROM bounds
      |), j AS (
      |  SELECT cal.event_type, cal.bucket_us, b.x
      |  FROM cal LEFT JOIN b USING (event_type, bucket_us)
      |), f AS (
      |  SELECT *, count(x) OVER (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING) AS fg
      |  FROM j
      |), filled AS (
      |  SELECT event_type, bucket_us,
      |    max(x) OVER (PARTITION BY event_type, fg) AS x_filled,
      |    x IS NULL AS is_gap
      |  FROM f
      |), c AS (
      |  SELECT *, CAST(sum(x_filled - 160000 - 16000) OVER w AS BIGINT)
      |    AS cum
      |  FROM filled WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING)
      |), s AS (
      |  SELECT *, cum - least(0, min(cum) OVER w) AS cusum
      |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
      |    ROWS UNBOUNDED PRECEDING)
      |)
      |SELECT event_type, bucket_us, x_filled AS x_scaled, is_gap, cusum
      |FROM s WHERE cusum > 800000""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cusum"          -> (cusumQ _),
    "q_cusum_pinned"   -> (cusumPinnedQ _),
    "q_gap_fill"       -> (gapFillQ _),
    "pipeline_quality_watch" -> (qualityWatchQ _),
    "q_event_outliers" -> (eventOutliers _),
    "q_event_mad"      -> (eventMad _),
    "q_daily_spikes"   -> (dailySpikes _),
    "q_seasonal_spikes" -> (seasonalSpikes _),
    "q_weighted_median" -> (weightedMedianQ _),
    "q_ewma"           -> (ewmaQ _),
    "q_winsorize"      -> (winsorizeQ _),
    "q_percentiles"    -> (percentilesQ _),
    "q_rolling_7d"     -> (rolling7dQ _),
    "q_missing_hours"  -> (missingDaysQ _)
  )

  override val oracles: Map[String, String] = Map(
    "q_cusum"          -> cusumSql,
    "q_cusum_pinned"   -> cusumPinnedSql,
    "q_gap_fill"       -> gapFillSql,
    "pipeline_quality_watch" -> qualityWatchSql,
    "q_event_outliers" -> eventOutliersSql,
    "q_event_mad"      -> eventMadSql,
    "q_daily_spikes"   -> dailySpikesSql,
    "q_seasonal_spikes" -> seasonalSpikesSql,
    "q_weighted_median" -> weightedMedianSql,
    "q_ewma"           -> ewmaSql,
    "q_winsorize"      -> winsorizeSql,
    "q_percentiles"    -> percentilesSql,
    "q_rolling_7d"     -> rolling7dSql,
    "q_missing_hours"  -> missingDaysSql
  )
}
