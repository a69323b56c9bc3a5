package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Integer-exact statistical anomaly detection — the pipeline-monitoring
 * operators a 100 TB ingest runs continuously: row-level value outliers
 * (bad sensor readings, corrupted metrics) and per-group volume spikes
 * (a source suddenly 3σ over its daily mean = crawler loop or upstream
 * incident).
 *
 * Exactness contract: the usual z-score `|v - mean| > k·σ` divides and
 * square-roots, which no two engines reproduce bit-identically. Instead
 * the test is algebraically cleared of both: with per-group n = count,
 * s = Σv, q = Σv² over per-row integer-floored values v = ⌊x·scale⌋,
 *
 *   (v·n − s)² · kDen² > kNum² · (n·q − s²)        [all integers]
 *
 * is EXACTLY `|v - mean| > (kNum/kDen)·σ_pop` — every engine that can
 * multiply 128-bit integers agrees on every row, no FP tie-breaking, no
 * epsilon. Spark evaluates the cleared form in DECIMAL(38,0) (the
 * products reach ~1e21, past 64-bit but far inside 38 digits); a DuckDB
 * oracle mirrors it in HUGEINT.
 *
 * 100 TB shape: one partial-aggregated groupBy over (group, v) —
 * shuffle carries #groups × 24 B — then the tiny stats table broadcast
 * back onto the stream; the flag itself is a map-side projection. Rows
 * never shuffle. Caller picks `scale` so Σv² fits a signed 64-bit
 * accumulator (|v| ≤ 3e6 is safe past 1e6 rows/group; the default
 * milli-scale handles values up to ~9e6 at 1e5 rows/group).
 *
 * The reference (sourcenetwork/lens) leaves analytics like this to
 * downstream consumers of its document streams (reference:
 * host-go/engine/pipes/fromSource.go:37-56); here it is a first-class
 * relational operator.
 */
object Anomaly {

  private val Dec = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(Dec)

  /**
   * Flag rows whose `valueCol` deviates more than kNum/kDen population
   * standard deviations from their `groupCol` mean. Appends
   * `value_int` (= ⌊value·scale⌋, the integer the test ran on) and
   * `is_outlier`; all input columns pass through unchanged.
   */
  def zscoreOutliers(
      df: DataFrame, valueCol: String, groupCol: String,
      kNum: Long = 3, kDen: Long = 1, scale: Long = 1000L): DataFrame = {
    require(kNum > 0 && kDen > 0, "k must be a positive rational")
    val withV = df.withColumn("value_int",
      floor(col(valueCol) * lit(scale)).cast(LongType))
    val stats = withV.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(col("value_int")).as("__s"),
        sum(col("value_int") * col("value_int")).as("__q"))
    val dev = d(col("value_int")) * d(col("__n")) - d(col("__s"))
    val varN2 = d(col("__n")) * d(col("__q")) - d(col("__s")) * d(col("__s"))
    withV.join(broadcast(stats), Seq(groupCol))
      .withColumn("is_outlier",
        dev * dev * lit(kDen * kDen) > lit(kNum * kNum) * varN2)
      .drop("__n", "__s", "__q")
  }

  /**
   * Robust (median/MAD) outlier detection — the estimator actually used on
   * dirty data, where the outliers themselves inflate mean and σ until the
   * z-test stops seeing them: flag rows with |v − median| · kDen >
   * kNum · MAD, where MAD is the median absolute deviation from the group
   * median. Defaults encode the Iglewicz–Hoaglin modified z-score cut at
   * 3.5 (0.6745·|dev|/MAD > 3.5, both sides scaled by 2000 to the exact
   * integer ratio 7000/1349). Medians are ORDER STATISTICS over the
   * integer-floored values — actual data elements, so every engine agrees
   * exactly with no FP clearing needed at all.
   *
   * Scale note: `percentile_disc` is an exact order statistic — Spark's
   * aggregate buffers the per-group value multiset, fine for the
   * groups×values this monitor sees (metrics per source/type), wrong for
   * corpus-sized groups. At that scale take the group median via
   * GlobalSequence ranks (the q_quality_buckets shape) or accept the
   * GK sketch bound certified by q_agg_quantile_verify; the flag itself
   * stays a broadcast-joined map-side projection either way.
   */
  def madOutliers(
      df: DataFrame, valueCol: String, groupCol: String,
      kNum: Long = 7000, kDen: Long = 1349, scale: Long = 1000L): DataFrame = {
    require(kNum > 0 && kDen > 0, "k must be a positive rational")
    val withV = df.withColumn("value_int",
      floor(col(valueCol) * lit(scale)).cast(LongType))
    // percentile_disc returns DOUBLE; the statistic is an actual integer
    // element, so the cast back to long is exact.
    val med = withV.groupBy(col(groupCol))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value_int)")
        .cast(LongType).as("median_int"))
    val withDev = withV.join(broadcast(med), Seq(groupCol))
      .withColumn("abs_dev_int", abs(col("value_int") - col("median_int")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev_int)")
        .cast(LongType).as("mad_int"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        col("abs_dev_int") * lit(kDen) > lit(kNum) * col("mad_int"))
  }

  /**
   * Per-group volume-spike detection: bucket event times into fixed
   * windows of `bucketUs` microseconds, count rows per (group, bucket),
   * and flag buckets whose count is a kNum/kDen-σ outlier against that
   * group's own bucket history — [[zscoreOutliers]] over the count table
   * (scale 1: counts are already integers). Output is one row per
   * (group, bucket) with `n_events` and `is_outlier`; input rows never
   * shuffle — only the (group, bucket) count table (bounded by
   * groups × time-span/bucket, not event volume) moves.
   */
  def volumeSpikes(
      df: DataFrame, tsUsCol: String, groupCol: String,
      bucketUs: Long, kNum: Long = 5, kDen: Long = 2): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val counts = df
      .withColumn("bucket_us",
        col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"))
    zscoreOutliers(counts, "n_events", groupCol,
      kNum = kNum, kDen = kDen, scale = 1L)
      .select(col(groupCol), col("bucket_us"), col("n_events"),
        col("is_outlier"))
  }

  /**
   * Exact weighted median per group — the lower weighted median: the
   * smallest value v with cum_weight(≤ v) · 2 ≥ total_weight. The
   * estimator for "typical price per unit SOLD" style questions where
   * every row carries a mass, and the plain median over rows answers
   * the wrong question. Integer-exact: values floor to `scale` units,
   * weights floor to integers, and the defining inequality is pure
   * integer comparison — both engines agree on every group.
   *
   * 100 TB shape: rows collapse to (group, value) weight sums FIRST
   * (partial aggregation; the window then runs over DISTINCT values per
   * group, not rows), the total-weight table broadcasts back, and the
   * median pick is a groupBy min. Weights must be non-negative.
   */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
      groupCol: String, scale: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slim = df.select(col(groupCol),
      floor(col(valueCol) * lit(scale)).cast(LongType).as("__v"),
      floor(col(weightCol)).cast(LongType).as("__w"))
    val perV = slim.groupBy(col(groupCol), col("__v"))
      .agg(sum(col("__w")).as("__wv"))
    val wtot = perV.groupBy(col(groupCol)).agg(sum(col("__wv")).as("w_total"))
    val cum = perV.withColumn("__cumw",
      sum(col("__wv")).over(Window.partitionBy(col(groupCol)).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(broadcast(wtot), Seq(groupCol))
      .where(col("__cumw") * 2 >= col("w_total"))
      .groupBy(col(groupCol), col("w_total"))
      .agg(min(col("__v")).as("wmedian_units"))
      .select(col(groupCol), col("w_total"), col("wmedian_units"))
  }

  /**
   * SEASONAL volume-spike detection — the diurnal/weekly-aware sibling of
   * [[volumeSpikes]]: same fixed `bucketUs` buckets, but each
   * (group, bucket) count is tested against the history of its own PHASE
   * — bucket index mod `periodBuckets` (hour buckets + period 24 =
   * hour-of-day profile; period 168 = hour-of-week) — for that group.
   * A 3 am burst that is still far below the daily peak is invisible to
   * [[volumeSpikes]]'s whole-history stats (the diurnal swing IS the
   * variance) but stands out against other 3 am buckets; AnomalySpec pins
   * exactly that masking contrast. Phase arithmetic is `div`/`%` on the
   * non-negative bucket index, so Spark's truncating DIV and DuckDB's
   * flooring `//` agree exactly.
   *
   * 100 TB shape: identical to [[volumeSpikes]] — rows never shuffle,
   * only the (group, bucket) count table moves, and the per-(group,
   * phase) stats table (groups × period rows) broadcasts back.
   */
  def seasonalSpikes(
      df: DataFrame, tsUsCol: String, groupCol: String,
      bucketUs: Long, periodBuckets: Long,
      kNum: Long = 5, kDen: Long = 2): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(periodBuckets > 0, "periodBuckets must be positive")
    val counts = df
      .withColumn("bucket_us",
        col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("phase", expr(s"(bucket_us div $bucketUs) % $periodBuckets"))
      .withColumn("__season", concat_ws("#", col(groupCol), col("phase")))
    zscoreOutliers(counts, "n_events", "__season",
      kNum = kNum, kDen = kDen, scale = 1L)
      .select(col(groupCol), col("phase"), col("bucket_us"),
        col("n_events"), col("is_outlier"))
  }

  /**
   * One-sided CUSUM changepoint detection per group — the
   * sustained-level-shift monitor the point tests above can't be: a z/MAD
   * outlier flags one extreme bucket, while CUSUM accumulates SMALL
   * persistent deviations (a 10% volume regression that never trips 2.5σ
   * alarms within days). Page's recursion `S_t = max(0, S_{t−1} + x_t −
   * μ − allowance)` is NOT directly window-expressible, but its closed
   * form is: with deviations `d_t` and prefix sums `C_t = Σ d_i`,
   * `S_t = C_t − min(0, min_{i≤t} C_i)` — two plain windows (running
   * sum + running min), no recursion, which is what lets both engines
   * replay it exactly.
   *
   * Integer-exact end to end: bucket sums quantize to `⌊v·scale⌋`,
   * per-group they shift non-negative by the group min (the EmbeddingQa
   * discipline — Spark DIV ≡ DuckDB // only on non-negative operands),
   * the reference level is `μ = total div n_buckets`, the allowance is
   * `μ·slackPpm div 10⁶` and the alarm threshold `μ·hPpm div 10⁶`.
   * Output one row per (group, bucket): the quantized shifted level, the
   * CUSUM statistic, and the alarm flag.
   *
   * 100 TB shape: event rows collapse map-side to the (group, bucket)
   * sum table — bounded by groups × time-span/bucket, never event
   * volume; the two windows and the per-group stats join all run on that
   * slim table under one group-hash partitioning. Low-side detection is
   * the same operator over negated values.
   */
  def cusum(
      df: DataFrame, tsUsCol: String, groupCol: String, valueCol: String,
      bucketUs: Long, scale: Long = 100L,
      slackPpm: Long = 100000L, hPpm: Long = 500000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket_us"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = df
      .withColumn("bucket_us",
        col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum(floor(col(valueCol).cast("double") * scale).cast("long"))
        .as("__x"))
    val stats = buckets.groupBy(col(groupCol)).agg(
      min(col("__x")).as("__lo"),
      sum(col("__x")).as("__tot"),
      count(lit(1)).as("__n"))
    buckets.join(broadcast(stats), Seq(groupCol))
      .withColumn("x_scaled", col("__x") - col("__lo")) // non-negative
      .withColumn("__mu", expr("(__tot - __n * __lo) div __n"))
      .withColumn("__d",
        col("x_scaled") - col("__mu") - expr(s"(__mu * $slackPpm) div 1000000"))
      .withColumn("__c", sum(col("__d")).over(run))
      .withColumn("cusum", col("__c") - least(lit(0L), min(col("__c")).over(run)))
      .withColumn("is_alarm", col("cusum") > expr(s"(__mu * $hPpm) div 1000000"))
      .select(col(groupCol), col("bucket_us"), col("x_scaled"),
        col("cusum"), col("is_alarm"))
  }

  /**
   * Pinned-target CUSUM over a pre-aggregated bucket table — the
   * production form of [[cusum]]: `target`/`allowance`/`threshold` come
   * from a calibration window (in the same ⌊v·scale⌋ units as `xCol`)
   * instead of the series' own mean, which makes the statistic a pure
   * fold of the observed bucket sums — exactly replayable on any
   * time-ordered split of the log, the property the streaming gate's
   * gate ≡ batch contract needs. Same closed form (running sum +
   * running prefix-min), deviations may be negative (no division
   * anywhere), alarm rows keep their statistic. Non-temp input columns
   * ride through untouched (so a gap-filled series keeps its `is_gap`
   * flag on the alarm row); `xCol` is renamed `x_scaled`.
   */
  def cusumWithTarget(buckets: DataFrame, groupCol: String, xCol: String,
      target: Long, allowance: Long, threshold: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("__d", col(xCol) - lit(target) - lit(allowance))
      .withColumn("__c", sum(col("__d")).over(w))
      .withColumn("cusum",
        col("__c") - least(lit(0L), min(col("__c")).over(w)))
      .withColumn("is_alarm", col("cusum") > lit(threshold))
      .drop("__d", "__c")
      .withColumnRenamed(xCol, "x_scaled")
  }

  /**
   * Calendar gap-fill with last-observation-carried-forward — the repair
   * verb for the gap AUDIT: materialize every bucket of each group's
   * [min, max] span (absent buckets included), mark the gaps, and fill
   * each gap with the most recent observed value. The downstream shape
   * every dashboard/trainer wants: a dense, regular series per key.
   *
   * LOCF without a recursive window, in two plain passes both engines
   * share: `fill_grp = count(x) OVER (ORDER BY bucket)` increments only
   * at observed rows, so each observed row and its trailing gap run
   * share one fill_grp; `x_filled = max(x) OVER (PARTITION BY group,
   * fill_grp)` then broadcasts the run's single non-null value. The
   * calendar itself is a per-group integer `sequence` explode — the
   * element type produced directly (a generator can't nest in a cast).
   *
   * Integer-exact: bucket sums quantize to `⌊v·scale⌋`; everything else
   * is additive integer arithmetic. First bucket of each group is
   * observed by construction (the span starts at the group's min), so
   * `fill_grp ≥ 1` and `x_filled` is never NULL.
   *
   * 100 TB shape: rows collapse map-side to the (group, bucket) sum
   * table; the calendar explode multiplies only the per-group BOUNDS
   * rows (one per group) by span/bucket — bounded by time, not volume;
   * both windows share the group-hash partitioning. Spans per group are
   * the caller's sanity check: a 10-year span at 1 s buckets is 3·10⁸
   * calendar rows PER GROUP — pick `bucketUs` to keep groups × span
   * shuffle-sized.
   */
  def gapFill(
      df: DataFrame, tsUsCol: String, groupCol: String, valueCol: String,
      bucketUs: Long, scale: Long = 100L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val buckets = df
      .withColumn("bucket_us",
        col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum(floor(col(valueCol).cast("double") * scale).cast("long"))
        .as("__x"))
    val calendar = buckets.groupBy(col(groupCol))
      .agg(min(col("bucket_us")).as("__lo"), max(col("bucket_us")).as("__hi"))
      .withColumn("__step",
        explode(sequence(lit(0L), expr(s"(__hi - __lo) div $bucketUs"))))
      .select(col(groupCol),
        (col("__lo") + col("__step") * bucketUs).as("bucket_us"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(buckets, Seq(groupCol, "bucket_us"), "left")
      .withColumn("__fg", count(col("__x")).over(w))
      .withColumn("x_filled",
        max(col("__x")).over(Window.partitionBy(col(groupCol), col("__fg"))))
      .withColumn("is_gap", col("__x").isNull)
      .select(col(groupCol), col("bucket_us"), col("x_filled"), col("is_gap"))
  }

  /**
   * Per-key exponentially-weighted moving average over event time — the
   * trend-smoothing companion to the point-in-time monitors above
   * ([[zscoreOutliers]] flags single rows; this tracks each entity's
   * drifting baseline, the metric a per-user/per-source health dashboard
   * plots). Integer-exact: values quantize to `floor(value·scale)` and
   * the recurrence is `s_t = ((den−num)·s_{t−1} + num·v_t) DIV den`
   * (smoothing factor num/den), seeded with `s_1 = v_1`. Every quantity
   * stays a non-negative integer (values must be ≥ 0 — enforced), so
   * Spark's truncating DIV and DuckDB's flooring `//` agree, and the
   * oracle replays the entire fold per key with `list_reduce`. Events
   * order by (ts, id) — a total order, so the fold is deterministic.
   *
   * A running fold is inherently sequential per key and NOT expressible
   * as codegen'd Column ops (no recursive window in Spark), so this is
   * the documented typed-API case: `flatMapGroups` with an in-memory
   * sort of ONE key's events. 100 TB shape: one user-keyed exchange of
   * 32-byte rows; per-key memory is bounded by that key's event count —
   * the same bound `Sessionize.sequences` carries, and the reason the
   * streaming face (state = one running s per key) is the unbounded-
   * history variant.
   */
  def ewmaByKey(
      df: DataFrame, keyCol: String, tsUsCol: String, valueCol: String,
      num: Long = 1, den: Long = 4, idCol: String,
      scale: Long = 100L): DataFrame = {
    require(num > 0 && den > num, "need 0 < num < den")
    val ss = df.sparkSession
    import ss.implicits._
    val slim = df.select(
        col(keyCol).cast("long").as("k"),
        col(tsUsCol).cast("long").as("us"),
        col(idCol).cast("long").as("id"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
    slim.groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var s = Long.MinValue
        evs.iterator.map { e =>
          require(e._4 >= 0, s"ewmaByKey requires non-negative values, got ${e._4}")
          s = if (s == Long.MinValue) e._4
              else ((den - num) * s + num * e._4) / den
          (k, e._3, e._4, s)
        }
      }
      .toDF(keyCol, idCol, "v", "ewma")
  }

  /**
   * Exact per-group winsorization — clip each value into the group's
   * [pLo, pHi] EXACT quantile band (order statistics, not an approximate
   * sketch). The treatment companion of [[zscoreOutliers]]/[[madOutliers]]:
   * those FLAG tail rows, this caps them, which is how training pipelines
   * neutralize metric outliers (reward clipping, loss-scale caps) without
   * dropping the rows.
   *
   * Integer-exact end to end: values floor to `scale` units, quantile
   * INDEX is `(n−1)·ppm div 10⁶ + 1` (non-negative operands, so Spark
   * `DIV` ≡ DuckDB `//`), and the clip is `greatest(least(v, hi), lo)` on
   * BIGINTs — every row replays bit-identically cross-engine.
   *
   * 100 TB shape: per-group rank WITHOUT a per-group window task — one
   * [[GlobalSequence]] range-partition pass over (group, v, id) gives
   * global ranks; per-group ranks are `rn − min(rn)+1` via a
   * #groups-row broadcast aggregate, the two bound rows per group reduce
   * to another #groups-row broadcast, and the clip is a narrow map. Rows
   * shuffle exactly once (the range exchange); every later join moves
   * only group-cardinality tables. The per-group window alternative
   * funnels each group through one task — unusable when a group holds
   * 10¹⁰ rows.
   *
   * reference: no winsorize in lens — arbitrary per-item numeric rules
   * live in guest modules (host-go/engine/tests/append_lens_test.go);
   * this is the §2.6 monitoring-family addition.
   */
  def winsorize(df: DataFrame, valueCol: String, idCol: String,
      groupCol: String, pLoPpm: Long = 10000L, pHiPpm: Long = 990000L,
      scale: Long = 1000L): DataFrame = {
    require(pLoPpm >= 0 && pHiPpm <= 1000000L && pLoPpm <= pHiPpm,
      "need 0 <= pLoPpm <= pHiPpm <= 1e6")
    // null values are excluded up front: Spark's struct ordering ranks a
    // null v FIRST while SQL engines' ORDER BY ranks it LAST, so a null
    // row would shift every per-group quantile index cross-engine (and
    // its own clip would be null anyway). Mirror with WHERE v IS NOT
    // NULL in any oracle.
    val q = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol),
        floor(col(valueCol).cast("double") * scale).cast("long").as("v"))
    val ranked = GlobalSequence.withSequentialId(q,
      struct(col(groupCol), col("v"), col(idCol)), "rn")
    val stats = ranked.groupBy(col(groupCol))
      .agg(min(col("rn")).as("rn0"), count(lit(1)).as("n"))
    val withR = ranked.join(broadcast(stats), Seq(groupCol))
      .withColumn("r", col("rn") - col("rn0") + 1)
      .withColumn("lo_r", expr(s"(n - 1) * $pLoPpm div 1000000 + 1"))
      .withColumn("hi_r", expr(s"(n - 1) * $pHiPpm div 1000000 + 1"))
    val bounds = withR
      .where(col("r") === col("lo_r") || col("r") === col("hi_r"))
      .groupBy(col(groupCol))
      .agg(min(when(col("r") === col("lo_r"), col("v"))).as("lo_v"),
        max(when(col("r") === col("hi_r"), col("v"))).as("hi_v"))
    withR.join(broadcast(bounds), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("v"),
        greatest(least(col("v"), col("hi_v")), col("lo_v")).as("v_clipped"))
  }

  /**
   * Exact per-group multi-quantile report — one row per group with the
   * EXACT order-statistic value at each requested ppm quantile (the
   * P50/P95/P99 latency-report shape, and the exact sibling of the
   * certified approx-quantile sketch: run this on the groups you alert
   * on, the sketch on everything). Column `p<ppm/10⁴>` for whole-percent
   * quantiles, `p<ppm>ppm` otherwise (so 990000 → `p99` and 999000 →
   * `p999000ppm` never collide); duplicate labels are rejected up front.
   *
   * Same integer-exact rank machinery as [[winsorize]] (one
   * [[GlobalSequence]] pass, per-group ranks by broadcast offset,
   * quantile INDEX `(n−1)·ppm div 10⁶ + 1`); the report itself is a
   * single #groups-row aggregate. Rows shuffle once, in the range
   * exchange.
   */
  def quantileReport(df: DataFrame, valueCol: String, idCol: String,
      groupCol: String, ppms: Seq[Long], scale: Long = 1000L,
      withCount: Boolean = false): DataFrame = {
    require(ppms.nonEmpty && ppms.forall(p => p >= 0 && p <= 1000000L),
      "need ppms in [0, 1e6]")
    def label(p: Long) = if (p % 10000L == 0L) s"p${p / 10000}" else s"p${p}ppm"
    require(ppms.map(label).distinct.size == ppms.size,
      s"duplicate quantile labels in ${ppms.mkString(",")}")
    // null exclusion: same rationale as [[winsorize]] (null-ordering
    // divergence would shift every quantile index).
    val q = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol),
        floor(col(valueCol).cast("double") * scale).cast("long").as("v"))
    val ranked = GlobalSequence.withSequentialId(q,
      struct(col(groupCol), col("v"), col(idCol)), "rn")
    val stats = ranked.groupBy(col(groupCol))
      .agg(min(col("rn")).as("rn0"), count(lit(1)).as("n"))
    val withR = ranked.join(broadcast(stats), Seq(groupCol))
      .withColumn("r", col("rn") - col("rn0") + 1)
    val picks = ppms.map { p =>
      min(when(col("r") === expr(s"(n - 1) * $p div 1000000 + 1"), col("v")))
        .as(label(p))
    }
    val aggs =
      (if (withCount) Seq(count(lit(1)).as("n_values")) else Nil) ++ picks
    withR.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
