package graft

import graft.operators.{Audit, Scd}
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality audits + SCD2 interval builder on hand-computable
 *  fixtures (the registered queries certify the clean-table path; these
 *  pin the DIRTY paths — orphans, nulls, run boundaries, ts ties). */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("fkOrphans: counts orphan rows, distinct orphan keys, null FKs") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(7L), Some(7L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Audit.fkOrphans(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Long)].collect().toSeq
    // orphans: 7, 7, and the NULL row; distinct orphan keys ignore NULL
    assert(out == Seq(("c->p", 6L, 3L, 1L)))
  }

  test("fkOrphans: clean relationship reports zeros") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Audit.fkOrphans(child, "fk", parent, "pk", "ok")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("ok", 3L, 0L, 0L)))
  }

  test("tableProfile: nulls, distincts and row counts per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("k", "s")
    val out = Audit.tableProfile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("k") == ((4L, 1L, 2L))) // values 1,1,2 -> 2 distinct
    assert(out("s") == ((4L, 1L, 2L))) // values a,b,b -> 2 distinct
  }

  test("histogram: hand-computed buckets; extremes land in first/last") {
    // group g: values 0.0 .. 10.0 -> milli 0..10000, 4 buckets of width
    // (10000-0+1)/4; v=10.0 must land in bucket 3 (the +1 denominator)
    val df = Seq(("g", 0.0), ("g", 2.0), ("g", 2.4), ("g", 5.0), ("g", 10.0))
      .toDF("grp", "v")
    val out = Audit.histogram(df, "v", "grp", nBuckets = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // bucket = (vm * 4) div 10001: 0->0, 2000->0, 2400->0, 5000->1, 10000->3
    assert(out == Set(
      ("g", 0L, 3L, 0L, 2400L),
      ("g", 1L, 1L, 5000L, 5000L),
      ("g", 3L, 1L, 10000L, 10000L)))
  }

  test("scd2 intervals: run collapse, half-open validity, ts-tie id order") {
    // u1: A@1, A@2, B@3, A@4 -> three versions; u2 has a ts tie where
    // event ids decide the order (id 50 'X' before id 51 'Y' at ts 5)
    val events = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 11L, "A"),
      (1L, 3L, 12L, "B"), (1L, 4L, 13L, "A"),
      (2L, 5L, 50L, "X"), (2L, 5L, 51L, "Y")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Scd.intervals(events, "user_id", "ts_us", "event_type",
        "event_id")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    assert(out == Set(
      (1L, "A", 1L, Some(3L), 2L),
      (1L, "B", 3L, Some(4L), 1L),
      (1L, "A", 4L, None, 1L),
      (2L, "X", 5L, Some(5L), 1L),
      (2L, "Y", 5L, None, 1L)))
  }

  test("scd2 intervals: NULL attrs form their OWN version runs (null-safe " +
      "change flag) — never silently merge into a neighbor") {
    // u1: A, NULL, NULL, A -> three versions (the NULL run surfaces with
    // attr = NULL); u2 STARTS with a NULL run -> it still opens a version
    val events = Seq(
      (1L, 1L, 10L, Some("A")), (1L, 2L, 11L, None),
      (1L, 3L, 12L, None), (1L, 4L, 13L, Some("A")),
      (2L, 5L, 50L, None), (2L, 6L, 51L, Some("B"))
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Scd.intervals(events, "user_id", "ts_us", "event_type",
        "event_id")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSet
    assert(out == Set(
      (1L, Some("A"), 1L, Some(2L), 1L),
      (1L, None, 2L, Some(4L), 2L),
      (1L, Some("A"), 4L, None, 1L),
      (2L, None, 5L, Some(6L), 1L),
      (2L, Some("B"), 6L, None, 1L)))
  }
}
