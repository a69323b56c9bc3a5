package graft

import graft.operators.{SkewJoin, Spans}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // 12 shared tokens (one duplicated 8-gram run longer than n), distinct
  // prefixes/suffixes per doc.
  private val boiler = "all rights reserved no part of this work may be reproduced ever"

  test("duplicateSpans: cross-doc boilerplate reports one merged maximal span") {
    val df = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five six"),
      (3L, "totally unique document with no duplicated runs at all here")
    ).toDF("doc_id", "text")
    val spans = Spans.duplicateSpans(df, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    // boiler = 12 tokens: doc 1 starts at token 3, doc 2 at token 2.
    assert(spans == Set((1L, 3L, 14L), (2L, 2L, 13L)))
  }

  test("duplicateSpans: same-document repetition counts as duplication") {
    val run = "p q r s t u v w" // exactly n = 8 tokens
    val df = Seq((7L, s"$run mid1 mid2 mid3 $run tail")).toDF("doc_id", "text")
    val spans = Spans.duplicateSpans(df, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((7L, 0L, 7L), (7L, 11L, 18L)))
  }

  test("duplicateSpans: adjacent windows merge, gaps split islands") {
    // Two docs sharing tokens 0..9 (3 overlapping 8-windows -> one span).
    val shared = "a b c d e f g h i j"
    val df = Seq(
      (1L, s"$shared x1 y1 z1"),
      (2L, s"$shared x2 y2 z2")
    ).toDF("doc_id", "text")
    val spans = Spans.duplicateSpans(df, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 9L), (2L, 0L, 9L)))
  }

  test("stripSpans: removes exactly the spanned tokens; clean docs untouched") {
    val df = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five six"),
      (3L, "totally unique document with no duplicated runs at all here")
    ).toDF("doc_id", "text")
    val out = Spans.stripSpans(df, "text", "doc_id", n = 8)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma delta epsilon")
    assert(out(2L) == "one two three four five six")
    assert(out(3L) == "totally unique document with no duplicated runs at all here")
  }

  test("stripSpans: fully-covered document survives as empty string") {
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val out = Spans.stripSpans(df, "text", "doc_id", n = 8)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "", 2L -> ""))
  }

  test("lens file drives strip_spans end-to-end (builtin:strip_spans)") {
    val df = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five six")
    ).toDF("doc_id", "text")
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:strip_spans",
        |  "arguments":{"text":"text","id":"doc_id","n":8}}]}""".stripMargin)
    val out = pipe.forward(df).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six"))
  }

  test("contaminatedSpans: only reference-quoting runs flagged; strip keeps the rest") {
    // corpus doc 1 quotes the benchmark item mid-document; doc 2 is
    // clean; doc 3 shares a run with doc 1 but NOT with the reference —
    // self-duplication must not flag in the cross-corpus mode.
    val shared = "this run repeats across corpus docs but never in the reference x"
    val corpus = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, "totally unique training document with no benchmark overlap at all"),
      (3L, s"one two $shared three four")
    ).toDF("doc_id", "text")
    val ref = Seq((100L, s"prefix $boiler suffix")).toDF("doc_id", "text")
    val spans = Spans.contaminatedSpans(corpus, ref, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    // boiler = 12 tokens, starts at token 2 of doc 1
    assert(spans == Set((1L, 2L, 13L)))
    val stripped = Spans.stripContaminated(corpus, ref, "text", "doc_id", n = 8)
      .as[(Long, String)].collect().toMap
    assert(stripped(1L) == "alpha beta gamma delta")
    assert(stripped(2L) ==
      "totally unique training document with no benchmark overlap at all")
    assert(stripped(3L) == s"one two $shared three four")
  }

  test("lens file drives strip_contam end-to-end (builtin:strip_contam)") {
    val corpus = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, "clean doc with nothing quoted from any benchmark here at all")
    ).toDF("doc_id", "text")
    Seq((100L, s"x $boiler y")).toDF("doc_id", "text")
      .createOrReplaceTempView("spans_spec_ref")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:strip_contam",
        |  "arguments":{"ref_table":"spans_spec_ref"}}]}""".stripMargin)
      .forward(corpus).as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma delta")
    assert(out(2L) ==
      "clean doc with nothing quoted from any benchmark here at all")
  }

  test("saltedInner equals the plain inner join, any salt bucket count") {
    val probe = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "pv")
    val build = Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("k", "bv")
    val expected = probe.join(build, Seq("k"))
      .as[(Long, String, Long)].collect().sorted.toSeq
    for (s <- Seq(1, 3, 16)) {
      val got = SkewJoin.saltedInner(probe, build, Seq("k"), saltBuckets = s)
        .select(col("k"), col("pv"), col("bv"))
        .as[(Long, String, Long)].collect().sorted.toSeq
      assert(got == expected, s"saltBuckets=$s")
    }
  }

  test("saltedInner scatters a hot key across salt buckets") {
    // 100 rows of ONE key: with plain join they'd hash to one reducer;
    // salted they must occupy many distinct salt values.
    val probe = (0 until 100).map(i => (1L, s"row$i")).toDF("k", "pv")
    val salts = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(16)))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(salts >= 10, s"hot key used only $salts of 16 salt buckets")
  }
}
