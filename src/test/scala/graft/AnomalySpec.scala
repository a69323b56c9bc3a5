package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the integer-exact z-score operators: the cleared-form
 *  comparison must agree with exact rational arithmetic (BigInt
 *  reference), honor the kNum/kDen ratio, floor (not truncate) negative
 *  values, and bucket volume spikes per group. */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("zscoreOutliers: hand-computable case honors the k ratio exactly") {
    // group a: [0,0,0,0,100] → mean 20, σ_pop 40; v=100 deviates 2σ.
    val df = Seq.fill(4)(0.0).map(("a", _)) :+ (("a", 100.0))
    val base = df.toDF("g", "v")
    def flagged(kNum: Long, kDen: Long) =
      Anomaly.zscoreOutliers(base, "v", "g", kNum, kDen, scale = 1L)
        .where(col("is_outlier")).select("value_int").as[Long].collect().toSet
    assert(flagged(3, 2) == Set(100L)) // 2σ > 1.5σ → flagged
    assert(flagged(2, 1) == Set.empty) // 2σ > 2σ is false: strict inequality
    assert(flagged(3, 1) == Set.empty)
  }

  test("zscoreOutliers: matches an exact BigInt reference on seeded data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, if (i % 3 == 0) "x" else "y",
        rnd.nextDouble() * 100 - 20 + (if (i % 97 == 0) 400.0 else 0.0))
    }
    val df = rows.toDF("id", "g", "v")
    val got = Anomaly.zscoreOutliers(df, "v", "g", kNum = 3, kDen = 1, scale = 1000L)
      .where(col("is_outlier")).select("id").as[Long].collect().toSet

    // reference: same milli floors, exact BigInt cleared-form comparison
    val byG = rows.groupBy(_._2)
    val expect = rows.filter { case (_, g, v) =>
      val vs = byG(g).map(t => BigInt(math.floor(t._3 * 1000).toLong))
      val (n, s, q) = (BigInt(vs.size), vs.sum, vs.map(x => x * x).sum)
      val vm = BigInt(math.floor(v * 1000).toLong)
      val d = vm * n - s
      d * d > 9 * (n * q - s * s)
    }.map(_._1).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("zscoreOutliers: negative values floor toward -inf (not truncate)") {
    val df = Seq(("a", -1.0005), ("a", 2.0)).toDF("g", "v")
    val ints = Anomaly.zscoreOutliers(df, "v", "g", scale = 1000L)
      .select("value_int").as[Long].collect().sorted
    assert(ints.toSeq == Seq(-1001L, 2000L))
  }

  test("madOutliers: robust to the contamination that blinds the z-test") {
    // group a: 20 inliers at 10..29 plus FOUR huge outliers. Masking: the
    // outliers inflate σ until their own z drops to ~2.2 (< 3 → z-test
    // blind) but leave median/MAD untouched (med 21, MAD 6 → modified
    // z ≈ 110).
    val vals = (0 until 20).map(i => 10.0 + i) ++ Seq.fill(4)(1000.0)
    val df = vals.map(("a", _)).toDF("g", "v")
    val zFlags = Anomaly.zscoreOutliers(df, "v", "g", kNum = 3, kDen = 1, scale = 1L)
      .where(col("is_outlier")).count()
    val madFlags = Anomaly.madOutliers(df, "v", "g", scale = 1L)
      .where(col("is_outlier")).select("value_int").as[Long].collect().toSet
    assert(zFlags == 0L)            // classic z-test misses all four
    assert(madFlags == Set(1000L))  // MAD flags them, inliers stay clean
    // median/MAD are order statistics of the actual data
    val r = Anomaly.madOutliers(df, "v", "g", scale = 1L)
      .select("median_int", "mad_int").head()
    assert(r.getLong(0) == 21L && r.getLong(1) == 6L)
  }

  test("q_agg_quantile_verify: GK rank-error contract holds on sf0.001") {
    // The registered certification query: every percentile_approx estimate
    // must sit within ceil(n/accuracy) ranks of its target — and the rank
    // interval columns must be internally consistent.
    val out = SparkEntry.queries("q_agg_quantile_verify")(spark, "/root/testdata/sf0.001")
      .select("within_bound", "rank_lo", "rank_hi", "n").collect()
    assert(out.length == 15) // 5 event types × 3 quantiles
    assert(out.forall(_.getBoolean(0)), "a sketch estimate violated its rank bound")
    assert(out.forall(r => r.getLong(1) <= r.getLong(2) + 1 && r.getLong(2) <= r.getLong(3)))
  }

  test("lens files drive outliers, volume_spikes, embed_contam, phash end-to-end") {
    import graft.engine.Pipeline
    // builtin:outliers over the hand-computable 2σ case at k=3/2
    val base = (Seq.fill(4)(0.0).map(("a", _)) :+ (("a", 100.0))).toDF("g", "v")
    val flagged = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:outliers",
        |"arguments":{"value":"v","group":"g","k_num":"3","k_den":"2","scale":"1"}}]}"""
        .stripMargin)
      .forward(base).where(col("is_outlier"))
      .select("value_int").as[Long].collect().toSeq
    assert(flagged == Seq(100L))

    // builtin:volume_spikes over a 3-bucket burst
    val day = 86400000000L
    val ev = ((for (d <- 0 until 10; i <- 0 until 10) yield ("x", d * day + i)) ++
      (for (i <- 0 until 100) yield ("x", 10 * day + i))).toDF("g", "t")
    val spikes = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:volume_spikes",
        |"arguments":{"ts":"t","group":"g","bucket_us":"86400000000"}}]}"""
        .stripMargin)
      .forward(ev).where(col("is_outlier"))
      .select("n_events").as[Long].collect().toSeq
    assert(spikes == Seq(100L))

    // builtin:embed_contam: corpus row 1 duplicates the catalog ref vector
    val v = Seq.tabulate(8)(_.toFloat + 1)
    Seq((100L, v)).toDF("vec_id", "embedding")
      .createOrReplaceTempView("anomaly_spec_ref")
    val pairs = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:embed_contam",
        |"arguments":{"ref_table":"anomaly_spec_ref","threshold":"0.99"}}]}"""
        .stripMargin)
      .forward(Seq((1L, v.map(_ * 2)), (2L, Seq.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
        .toDF("vec_id", "embedding"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L)))

    // builtin:phash: signature table shape from a payload column
    val sigs = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:phash","arguments":{"id":"doc_id"}}]}""")
      .forward(Seq((1L, "same text"), (2L, "same text"))
        .toDF("doc_id", "text")
        .withColumn("payload", encode(col("text"), "UTF-8")).drop("text"))
      .as[(Long, Long)].collect().toMap
    assert(sigs.keySet == Set(1L, 2L) && sigs(1L) == sigs(2L))
  }

  test("volumeSpikes: flags only the burst bucket, per group") {
    // type x: ten quiet days of 10 events + one day of 100 (≈3.2σ);
    // type y: constant 5/day (σ=0 → nothing can flag).
    val day = 86400000000L
    val events =
      (for (d <- 0 until 10; i <- 0 until 10) yield ("x", d * day + i)) ++
        (for (i <- 0 until 100) yield ("x", 10 * day + i)) ++
        (for (d <- 0 until 11; i <- 0 until 5) yield ("y", d * day + i))
    val df = events.toDF("g", "ts_us")
    val out = Anomaly.volumeSpikes(df, "ts_us", "g", bucketUs = day,
      kNum = 5, kDen = 2)
    assert(out.count() == 22) // 11 buckets per group
    val spikes = out.where(col("is_outlier"))
      .select("g", "bucket_us", "n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(spikes == Set(("x", 10 * day, 100L)))
  }

  test("weightedMedian: lower median honors weights; per-value collapse; " +
      "even-split picks the lower value") {
    val df = Seq(
      ("x", 1.0, 1.0), ("x", 2.0, 2.0), ("x", 3.0, 1.0), // W=4, med at 2.0
      ("y", 1.0, 1.0), ("y", 2.0, 1.0),                  // even split -> 1.0
      ("z", 5.0, 1.0), ("z", 5.0, 2.0), ("z", 9.0, 1.0)  // dup values merge
    ).toDF("g", "v", "w")
    val out = Anomaly.weightedMedian(df, "v", "w", "g")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("x", 4L, 2000L), ("y", 2L, 1000L), ("z", 4L, 5000L)))
  }

  test("seasonalSpikes: a night burst masked by the diurnal swing is " +
      "flagged against its own phase") {
    // noon peak of 100/hour for 10 days; 3am baseline 10/hour for 9 days,
    // then a 40-event 3am burst on day 9. Globally the diurnal swing IS
    // the variance (σ≈44, the burst sits inside 1σ — volumeSpikes stays
    // silent); against the 3am phase history (μ=13, σ=9) it is 3σ.
    val hour = 3600000000L; val day = 24 * hour
    val events =
      (for (d <- 0 until 10; i <- 0 until 100)
        yield ("x", d * day + 12 * hour + i)) ++
        (for (d <- 0 until 9; i <- 0 until 10)
          yield ("x", d * day + 3 * hour + i)) ++
        (for (i <- 0 until 40) yield ("x", 9 * day + 3 * hour + i))
    val df = events.toDF("g", "ts_us")
    val global = Anomaly.volumeSpikes(df, "ts_us", "g", bucketUs = hour,
      kNum = 5, kDen = 2).where(col("is_outlier")).count()
    assert(global == 0, "fixture drifted: the global test saw the burst")
    val seasonal = Anomaly.seasonalSpikes(df, "ts_us", "g", bucketUs = hour,
      periodBuckets = 24, kNum = 5, kDen = 2)
    assert(seasonal.count() == 20) // 10 noon + 10 3am buckets
    val flagged = seasonal.where(col("is_outlier"))
      .select("g", "phase", "bucket_us", "n_events")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(flagged == Set(("x", 3L, 9 * day + 3 * hour, 40L)))
  }

  test("cusum: closed form equals Page's recursion on a level-shifted " +
      "series; small persistent drift alarms where the z-test stays quiet") {
    // group a: 10 buckets at level ~100, then 10 at ~115 — a +15%
    // sustained shift. Each bucket is one event (sum == value).
    val vals = Seq.fill(10)(100.0) ++ Seq.fill(10)(115.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong * 86400000000L, v) }.toDF("g", "ts_us", "v")
    val out = Anomaly.cusum(df, "ts_us", "g", "v",
        bucketUs = 86400000000L, scale = 1000L,
        slackPpm = 100000L, hPpm = 500000L)
      .orderBy("bucket_us")
      .select("x_scaled", "cusum", "is_alarm")
      .as[(Long, Long, Boolean)].collect().toSeq
    // reference: Page's recursion with the same integer quantities
    val xs = vals.map(v => math.floor(v * 1000).toLong)
    val lo = xs.min
    val shifted = xs.map(_ - lo)
    val mu = shifted.sum / shifted.length
    val slack = mu * 100000L / 1000000L
    val h = mu * 500000L / 1000000L
    var s = 0L
    val expect = shifted.map { x =>
      s = math.max(0L, s + x - mu - slack)
      (x, s, s > h)
    }
    assert(out == expect)
    // the shift accumulates into an alarm by the tail...
    assert(out.last._3, "sustained +15% drift must alarm")
    // ...but never trips the 2.5σ point test (σ is inflated by the
    // bimodal split, each point is < 2.5σ from the global mean)
    val z = Anomaly.zscoreOutliers(df, "v", "g", kNum = 5, kDen = 2,
        scale = 1000L)
      .where(col("is_outlier")).count()
    assert(z == 0L, "the point z-test must be blind to the small shift")
  }

  test("cusum: negative deviations never go below zero (one-sided reset)") {
    val vals = Seq(100.0, 100.0, 10.0, 10.0, 100.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong * 1000L, v) }.toDF("g", "ts_us", "v")
    val out = Anomaly.cusum(df, "ts_us", "g", "v", bucketUs = 1000L,
        scale = 1L, slackPpm = 0L, hPpm = 1000000L)
      .orderBy("bucket_us").select("cusum").as[Long].collect().toSeq
    assert(out.forall(_ >= 0L), s"CUSUM must clamp at zero, got $out")
    // after the dip the statistic restarts from 0, not from a debt
    val xs = vals.map(_.toLong); val lo = xs.min
    val sh = xs.map(_ - lo); val mu = sh.sum / sh.length
    var s = 0L
    val expect = sh.map { x => s = math.max(0L, s + x - mu); s }
    assert(out == expect)
  }

  test("gapFill: LOCF fills interior gaps, marks them, and never emits " +
      "a NULL fill (first bucket observed by construction)") {
    // g: buckets 0,1,4,5 observed; 2,3 are gaps carrying bucket-1's sum.
    // bucket 1 has TWO events (sums add); h: single bucket, no gaps.
    val df = Seq(
      ("g", 0L, 10.0), ("g", 1000L, 3.0), ("g", 1500L, 4.0),
      ("g", 4000L, 9.0), ("g", 5000L, 2.0),
      ("h", 7000L, 1.0)
    ).toDF("g0", "ts_us", "v")
    val out = Anomaly.gapFill(df, "ts_us", "g0", "v",
        bucketUs = 1000L, scale = 1L)
      .select("g0", "bucket_us", "x_filled", "is_gap")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("g", 0L, 10L, false),
      ("g", 1000L, 7L, false), // 3 + 4 summed within the bucket
      ("g", 2000L, 7L, true),
      ("g", 3000L, 7L, true),
      ("g", 4000L, 9L, false),
      ("g", 5000L, 2L, false),
      ("h", 7000L, 1L, false)))
  }

  test("ewmaByKey: hand-computed integer fold, (ts, id) total order") {
    import spark.implicits._
    // key 1 in scrambled arrival order; same-ts tie broken by id
    val df = Seq(
      (1L, 30L, 3L, 3.00), (1L, 10L, 1L, 1.00), (1L, 20L, 2L, 2.00),
      (1L, 30L, 4L, 4.00),  // same ts as id 3 → folds after it
      (2L, 5L, 9L, 7.00)
    ).toDF("user_id", "ts_us", "event_id", "value")
    val got = graft.operators.Anomaly
      .ewmaByKey(df, "user_id", "ts_us", "value", num = 1, den = 4,
        idCol = "event_id")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // cents: 100, 200, 300, 400 → s: 100, (300+200)/4=125,
    // (375+300)/4=168, (504+400)/4=226
    assert(got(1L) == ((100L, 100L)))
    assert(got(2L) == ((200L, 125L)))
    assert(got(3L) == ((300L, 168L)))
    assert(got(4L) == ((400L, 226L)))
    assert(got(9L) == ((700L, 700L)))
  }

  test("ewmaByKey rejects negative values (DIV/floor-div would disagree)") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, -5.0)).toDF("user_id", "ts_us", "event_id", "value")
    val ex = intercept[Exception] {
      graft.operators.Anomaly
        .ewmaByKey(df, "user_id", "ts_us", "value", idCol = "event_id")
        .collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      ex.getCause != null)
  }

  test("ewma binds as a lens-file stage (builtin:ewma)") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L, 1.00), (1L, 20L, 2L, 2.00))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:ewma",
        |  "arguments":{"key":"user_id","ts":"ts_us","value":"value",
        |               "id":"event_id","den":"4"}}]}""".stripMargin)
      .forward(df).as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(out == Map(1L -> 100L, 2L -> 125L))
  }

  test("quantileReport: exact order-statistic picks per group, lens-reachable") {
    import graft.engine.Pipeline
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "a", i.toDouble)) ++
      (101 to 103).map(i => (i.toLong, "b", 42.0))).toDF("id", "g", "v")
    val out = Anomaly.quantileReport(df, "v", "id", "g",
        ppms = Seq(500000L, 950000L, 990000L), scale = 1L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") == ((50L, 95L, 99L)))
    assert(out("b") == ((42L, 42L, 42L)))
    val lens = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:quantiles",
        |  "arguments":{"value":"v","id":"id","group":"g","scale":"1",
        |    "ppms":["500000","990000"]}}]}""".stripMargin)
      .forward(df).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lens("a") == ((50L, 99L)))
  }

  test("lens file drives winsorize end-to-end (builtin:winsorize)") {
    import graft.engine.Pipeline
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:winsorize",
        |  "arguments":{"value":"v","id":"id","group":"g",
        |    "p_lo_ppm":"100000","p_hi_ppm":"900000","scale":"1"}}]}"""
        .stripMargin)
      .forward(df).as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == 10L && out(50L) == 50L && out(100L) == 90L)
  }

  test("winsorize: exact per-group order-statistic bounds clip the tails") {
    import spark.implicits._
    // group a: values 1..100 (scale=1): p10 index = 99*100000 div 1e6 + 1
    // = 10 → lo=10; p90 index = 99*900000 div 1e6 + 1 = 90 → hi=90.
    // group b: constant → lo=hi → nothing changes.
    val a = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
    val b = (101 to 110).map(i => (i.toLong, "b", 7.0))
    val df = (a ++ b).toDF("id", "g", "v")
    val out = Anomaly.winsorize(df, "v", "id", "g",
        pLoPpm = 100000L, pHiPpm = 900000L, scale = 1L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == 10L && out(5L) == 10L && out(10L) == 10L)
    assert(out(11L) == 11L && out(50L) == 50L && out(90L) == 90L)
    assert(out(91L) == 90L && out(100L) == 90L)
    assert((101 to 110).forall(i => out(i.toLong) == 7L))
  }

  test("winsorize: matches a brute-force in-memory reference on a " +
      "negative-valued skewed sample") {
    import spark.implicits._
    val vals = Seq(-50.5, -3.2, 0.0, 1.1, 2.2, 2.2, 3.3, 4.4, 5.5, 900.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "g", "v")
    val scale = 1000L
    val ints = vals.map(v => math.floor(v * scale).toLong)
    val sorted = ints.zipWithIndex.sortBy { case (v, i) => (v, i) }.map(_._1)
    val n = sorted.size
    val lo = sorted(((n - 1) * 100000L / 1000000L).toInt)
    val hi = sorted(((n - 1) * 900000L / 1000000L).toInt)
    val expect = ints.map(v => math.max(math.min(v, hi), lo))
    val out = Anomaly.winsorize(df, "v", "id", "g",
        pLoPpm = 100000L, pHiPpm = 900000L, scale = scale)
      .as[(Long, String, Long, Long)].collect()
      .sortBy(_._1).map(_._4).toSeq
    assert(out == expect)
  }
}
