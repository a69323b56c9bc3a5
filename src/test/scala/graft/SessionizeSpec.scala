package graft

import graft.operators.Sessionize
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("sessions break at gap, keys independent, ties deterministic") {
    import spark.implicits._
    val df = Seq(
      // user 1: events at t=0,10,1000,1005 with gap 100 → sessions 1,1,2,2
      (1L, 0L, 1L), (2L, 10L, 1L), (3L, 1000L, 1L), (4L, 1005L, 1L),
      // user 2: single event → session 1
      (5L, 5000L, 2L),
      // user 3: equal timestamps, tie-broken by event_id
      (6L, 7L, 3L), (7L, 7L, 3L))
      .toDF("event_id", "ts", "user_id")
    val out = Sessionize.assign(df, "user_id", "ts", gap = 100L, tieCol = "event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 1L))

    val stats = Sessionize.stats(
      Sessionize.assign(df, "user_id", "ts", 100L, "event_id"), "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(stats((1L, 1L)) == ((2L, 10L)))   // 2 events, duration 10
    assert(stats((1L, 2L)) == ((2L, 5L)))
    assert(stats((2L, 1L)) == ((1L, 0L)))
    assert(stats((3L, 1L)) == ((2L, 0L)))
  }

  test("sequences: per-session ordered paths, ties broken by the tie column") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, 1L, "view"), (2L, 10L, 1L, "click"),
      (3L, 1000L, 1L, "view"), (4L, 1005L, 1L, "purchase"),
      // equal timestamps: event_id order decides the path
      (6L, 7L, 3L, "b_second"), (5L, 7L, 3L, "a_first"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val paths = Sessionize.sequences(
      Sessionize.assign(df, "user_id", "ts", gap = 100L, tieCol = "event_id"),
      "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(paths((1L, 1L)) == ((2L, 0L, "view>click")))
    assert(paths((1L, 2L)) == ((2L, 1000L, "view>purchase")))
    assert(paths((3L, 1L)) == ((2L, 7L, "a_first>b_second")),
      "tie at ts=7 must order by event_id (5 before 6)")
  }

  test("session_paths binds as one lens-file stage (builtin:session_paths)") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1L, "x"), (2L, 5L, 1L, "y"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:session_paths","arguments":
        |{"key":"user_id","ts":"ts","gap":"100","tie":"event_id",
        |"step":"event_type","sep":"-"}}]}""".stripMargin).forward(df)
    val r = out.collect().head
    assert(r.getString(4) == "x-y")
  }

  test("funnel: strict first-touch ordering; same-timestamp and missing stages excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full path
      (2L, 5L, "click"), (2L, 10L, "view"),   // click precedes first view
      (3L, 10L, "view"),                      // view only
      (4L, 10L, "click"), (4L, 20L, "purchase"), // never viewed
      (5L, 10L, "view"), (5L, 10L, "click")   // simultaneous: strict > excludes
    ).toDF("user_id", "us", "event_type")
    val out = graft.operators.Funnel
      .report(df, "user_id", "us", "event_type", Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("1_view" -> 4L, "2_click" -> 1L, "3_purchase" -> 1L))
  }

  test("funnel: conversion window bounds each stage; boundary is inclusive") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),  // within W=10
      (2L, 10L, "view"), (2L, 21L, "click"),                         // click 11 > W after view
      (3L, 10L, "view"), (3L, 20L, "click"), (3L, 31L, "purchase"),  // purchase misses window
      (4L, 10L, "view"), (4L, 15L, "click"), (4L, 25L, "purchase")   // boundary: 25 = 15+10 counts
    ).toDF("user_id", "us", "event_type")
    val out = graft.operators.Funnel
      .report(df, "user_id", "us", "event_type",
        Seq("view", "click", "purchase"), windowUs = Some(10L))
      .as[(String, Long)].collect().toMap
    assert(out == Map("1_view" -> 4L, "2_click" -> 3L, "3_purchase" -> 2L))
  }

  test("funnel: userStages emits per-user first-touch rows consistent with report") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 15L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "view"), (2L, 50L, "click"),
      (3L, 7L, "click")
    ).toDF("user_id", "us", "event_type")
    val rows = graft.operators.Funnel
      .userStages(df, "user_id", "us", "event_type", Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSet
    // first-touch click for user 1 is the EARLIEST qualifying (15 > 10)
    assert(rows == Set(
      (1L, "1_view", 10L), (1L, "2_click", 15L), (1L, "3_purchase", 30L),
      (2L, "1_view", 5L), (2L, "2_click", 50L)))
  }

  test("funnel: lens file drives report and users modes (builtin:funnel)") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 5L, "view")
    ).toDF("user_id", "us", "event_type")
    val report = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:funnel",
        |  "arguments":{"user":"user_id","ts":"us","type":"event_type",
        |               "stages":"view,click"}}]}""".stripMargin)
      .forward(df).as[(String, Long)].collect().toMap
    assert(report == Map("1_view" -> 2L, "2_click" -> 1L))
    val users = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:funnel",
        |  "arguments":{"user":"user_id","ts":"us","type":"event_type",
        |               "stages":"view,click","window":"5","mode":"users"}}]}""".stripMargin)
      .forward(df).as[(Long, String, Long)].collect().toSet
    // window 5: user 1's click at 20 is 10 after view at 10 — excluded
    assert(users == Set((1L, "1_view", 10L), (2L, "1_view", 5L)))
  }

  test("retentionCohorts: first-bucket cohorts with exact offset counts") {
    import spark.implicits._
    // bucket size 100: u1 active in buckets 0,1,3; u2 in 1,2; u3 in 1
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 150L), (1L, 399L),
      (2L, 101L), (2L, 250L),
      (3L, 199L)
    ).toDF("user_id", "us")
    val got = Sessionize.retentionCohorts(df, "user_id", "us", bucketUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L), // u1's cohort 0
      (1L, 0L, 2L), (1L, 1L, 1L)))              // u2+u3 cohort 1; u2 at +1
    // duplicate activity within a bucket counts once
    val dup = Sessionize.retentionCohorts(
      df.union(df), "user_id", "us", bucketUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(dup == got)
  }

  test("userGrowth: first-seen buckets, returning users don't recount, " +
      "running total is prefix-distinct") {
    import spark.implicits._
    // bucket=10: u1,u2 @ b0; u1 returns @ b10 (no recount); u3 @ b20
    val df = Seq(
      (1L, 1L), (2L, 3L), (1L, 12L), (3L, 25L), (2L, 27L)
    ).toDF("user_id", "ts_us")
    val got = Sessionize.userGrowth(df, "user_id", "ts_us", bucketUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 2L, 2L), (20L, 1L, 3L)))
  }

  test("transitionMatrix: per-user lag pairs, ts-tie id order, truncated " +
      "ppm rows sum to <= 1e6 per from-state") {
    import spark.implicits._
    // u1: a->b->a (ties at ts 5 decided by event_id: 50 'b' before 51 'a')
    // u2: a->a; no cross-user transition between u1's last and u2's first
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 5L, 50L, "b"), (1L, 5L, 51L, "a"),
      (2L, 7L, 60L, "a"), (2L, 9L, 61L, "a")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessionize.transitionMatrix(df, "user_id", "ts_us",
        "event_id", "event_type")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // transitions: (a,b) (b,a) (a,a) -> marginals a:2, b:1
    assert(got == Set(
      ("a", "b", 1L, 2L, 500000L),
      ("a", "a", 1L, 2L, 500000L),
      ("b", "a", 1L, 1L, 1000000L)))
    // ppm truncation bound on the real log: sum over to-states <= 1e6
    val real = graft.queries.T(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
    val sums = Sessionize.transitionMatrix(real, "user_id", "ts_us",
        "event_id", "event_type")
      .groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("p_ppm").as("s"))
      .select("s").as[Long].collect()
    assert(sums.nonEmpty && sums.forall(s => s <= 1000000L && s > 900000L),
      s"ppm rows must truncate-sum to (0.9e6, 1e6], got ${sums.toSeq}")
  }

  test("rollingActiveUsers: trailing-window distincts on present buckets only") {
    import spark.implicits._
    val spark2 = spark
    // bucketUs=10, window=2: bucket 0 users {1,2}; bucket 10 user {2};
    // bucket 30 user {3}; bucket 20 EMPTY (no output row even though the
    // [10,20] window has users). Duplicate events must not double-count.
    val df = Seq(
      ("x", 1L, 1L), ("x", 2L, 2L), ("x", 3L, 2L), // bucket 0 (dup user 2)
      ("x", 12L, 2L),                              // bucket 10
      ("x", 33L, 3L)                               // bucket 30
    ).toDF("g", "ts_us", "user_id")
    val got = Sessionize.rollingActiveUsers(df, "user_id", "ts_us", "g",
        bucketUs = 10L, windowBuckets = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("x", 0L, 2L), ("x", 10L, 2L), ("x", 30L, 1L)))
  }
}
