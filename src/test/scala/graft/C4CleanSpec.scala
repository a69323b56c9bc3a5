package graft

import graft.operators.C4Clean
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class C4CleanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def cleanOne(text: String, minLineWords: Int = 3,
      minKeptLines: Int = 5, punct: Boolean = true) = {
    val out = C4Clean.clean(Seq((1L, text)).toDF("doc_id", "text"),
      "text", "doc_id", minLineWords, minKeptLines, punct).collect()(0)
    (out.getLong(1), out.getLong(2), out.getString(3), out.getBoolean(4))
  }

  private val goodLines = Seq(
    "This is a perfectly reasonable first sentence.",
    "Here is another sentence that ends properly!",
    "Does this line also end with terminal punctuation?",
    "\"A quoted ending counts as terminal too.\"",
    "And one more closing sentence for good measure.")

  test("full C4 rule set keeps prose lines and passes a clean page") {
    val (nLines, nKept, clean, pass) =
      cleanOne(goodLines.mkString("\n"))
    assert(nLines == 5 && nKept == 5 && pass)
    assert(clean == goodLines.mkString("\n"), "kept text must round-trip")
  }

  test("lines without terminal punctuation, short lines, and javascript lines drop") {
    val dirty = goodLines ++ Seq(
      "no terminal punctuation on this line at all",  // no punct
      "Too short.",                                    // < 3 words
      "Please enable JavaScript to view the comments.") // boilerplate
    val (nLines, nKept, clean, pass) = cleanOne(dirty.mkString("\n"))
    assert(nLines == 8 && nKept == 5 && pass)
    assert(clean == goodLines.mkString("\n"),
      "only the five prose lines survive, in order")
  }

  test("page rules: lorem ipsum, curly braces, and too few kept lines fail the doc") {
    val (_, _, _, lorem) = cleanOne(
      (goodLines :+ "Lorem Ipsum dolor sit amet today.").mkString("\n"))
    assert(!lorem, "lorem ipsum anywhere fails the page")
    val (_, _, _, brace) = cleanOne(
      (goodLines :+ "function f() { return 1; }").mkString("\n"))
    assert(!brace, "a curly brace anywhere fails the page")
    val (_, kept, _, few) = cleanOne(goodLines.take(4).mkString("\n"))
    assert(kept == 4 && !few, "4 kept lines < minKeptLines=5 fails the page")
  }

  test("terminal-punctuation rule toggles off for punctuation-free corpora") {
    val raw = Seq(
      "five plain words sit here",
      "another five word line here",
      "short line")
    val (_, nKept, clean, _) =
      cleanOne(raw.mkString("\n"), minLineWords = 5, minKeptLines = 2,
        punct = false)
    assert(nKept == 2 && clean == raw.take(2).mkString("\n"))
  }

  test("operator is a pure projection: dropped docs stay as rows with pass=false") {
    val df = Seq(
      (1L, goodLines.mkString("\n")),
      (2L, "tiny")).toDF("doc_id", "text")
    val out = C4Clean.clean(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }
}
