package graft

import graft.engine.Pipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The web-curation chain (C4 clean → DSIR select → token budget) driven
 *  end-to-end from ONE lens file — the lens-reachability proof for the
 *  corpus-selection wave, mirroring `pipeline_curate_web`'s composition
 *  (which the DuckDB oracle hash-certifies at sf0.01). */
class CurationPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def lines(ls: String*): String = ls.mkString("\n")
  private def prose(words: String, reps: Int): String =
    Seq.fill(reps)(words).mkString(" ")

  test("lens file runs C4 clean -> DSIR select -> token budget as one pipeline") {
    // Two clean science docs (match the target), one clean cooking doc,
    // one doc C4 rejects (single short line). 5-word lines, no
    // punctuation — the toggles the registered query uses.
    val corpus = Seq(
      (1L, "web", lines(
        prose("quantum field theory predicts interactions", 1),
        prose("quantum effects dominate field measurements", 1))),
      (2L, "web", lines(
        prose("field theory predicts quantum outcomes", 1),
        prose("measurable quantum interactions appear here", 1))),
      (3L, "books", lines(
        prose("simmer tomato sauce with basil", 1),
        prose("knead the dough until golden", 1))),
      (4L, "web", "tiny line")).toDF("doc_id", "source", "text")
    Seq((100L, prose("quantum field theory predicts measurable interactions " +
      "and quantum effects dominate field measurements", 3)))
      .toDF("doc_id", "text").createOrReplaceTempView("curation_spec_target")

    val out = Pipeline.fromJson(
      """{"lenses":[
        |{"path":"builtin:c4_clean","arguments":{"min_line_words":"5",
        |  "min_kept_lines":"2","terminal_punct":"false",
        |  "keep":["source"]}},
        |{"path":"builtin:filter","arguments":{"expr":"c4_pass"}},
        |{"path":"builtin:dsir","arguments":{"target_table":"curation_spec_target",
        |  "text":"clean_text","target_text":"text","mode":"select","k":"2",
        |  "buckets":"101"}},
        |{"path":"builtin:with_column","arguments":{"col":"tk",
        |  "expr":"cast(size(split(clean_text, ' ')) as bigint)"}},
        |{"path":"builtin:token_budget","arguments":{"group":"source",
        |  "tokens":"tk","budget":"1000","weights":{"web":"1.0"},
        |  "default":"1.0"}}
        |]}""".stripMargin)
      .forward(corpus)

    // Doc 4 fails C4 (one kept line < 2); DSIR's k=2 keeps the two
    // science docs; the plan therefore has ONE group (web) taking the
    // whole budget.
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(3), r.getLong(4)))
    assert(rows.length == 1 && rows(0)._1 == "web")
    assert(rows(0)._2 == 2L, "both selected docs are science/web docs")
    assert(rows(0)._3 == 1000L, "a single surviving group takes the full budget")
    assert(rows(0)._4 > 0L)
  }

  test("line dedup feeds Gopher filtering in ONE lens file") {
    import spark.implicits._
    // Doc 1 is a page whose real content passes min_words only AFTER the
    // repeated banner lines collapse into one (the within-page rule runs
    // first, then the word-count rule sees the cleaned text). Doc 2 is a
    // banner-only page: after dedup it is one short line and fails.
    val df = Seq(
      (1L, "subscribe now\nthe quick brown fox jumps over a lazy dog\nsubscribe now"),
      (2L, "subscribe now\nsubscribe now\nsubscribe now"))
      .toDF("doc_id", "text")
    // dedup_lines joins kept lines with '\n'; wsTokens splits on literal
    // spaces — the canonical normalize stage (whitespace collapse) sits
    // between them exactly as a real pipeline orders these passes.
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:dedup_lines"},
        |  {"path":"builtin:normalize","arguments":{"text":"clean_text"}},
        |  {"path":"builtin:rename","arguments":{"src":"text_norm","dst":"text"}},
        |  {"path":"builtin:gopher_rules","arguments":{"min_words":"5"}},
        |  {"path":"builtin:filter","arguments":{"expr":"gopher_pass"}}
        |]}""".stripMargin).forward(df)
    val kept = out.select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L),
      s"content page survives, banner-only page drops: got $kept")
  }
}
