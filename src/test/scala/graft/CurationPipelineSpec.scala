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
}
