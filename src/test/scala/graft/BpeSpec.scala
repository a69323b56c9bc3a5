package graft

import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // The classic Sennrich toy corpus shape: repeated words sharing subword
  // structure ("low", "lower", "newest", "widest").
  private val docs = Seq(
    (1L, "low low low low low lower lower"),
    (2L, "newest newest newest newest newest newest"),
    (3L, "widest widest widest"),
    (4L, "low newest widest lower")
  )

  private def wordCounts: Map[String, Long] =
    docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("train equals the in-memory reference implementation, merge by merge") {
    val df = docs.toDF("doc_id", "text")
    val got = Bpe.train(df, "text", merges = 12, minFreq = 2)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val want = Bpe.referenceMerges(wordCounts, merges = 12, minFreq = 2)
      .map { case (s, p, f) => (s.toLong, p, f) }
    assert(got == want)
    assert(got.nonEmpty)
    // First merge on this corpus: "e s" (newest 7 + widest 4 = 11) beats
    // "lo" ("l o" appears 9 times) — weighted by word frequency.
    assert(got.head._2 == "e s" && got.head._3 == 11L)
  }

  test("train is deterministic across reruns and stops when no pair reaches minFreq") {
    val df = docs.toDF("doc_id", "text")
    val a = Bpe.train(df, "text", merges = 6).as[(Long, String, Long)].collect().toSeq
    val b = Bpe.train(df, "text", merges = 6).as[(Long, String, Long)].collect().toSeq
    assert(a == b)
    // A corpus of all-distinct words has every pair at freq 1 < minFreq=2.
    val unique = Seq((1L, "abc defg hij")).toDF("doc_id", "text")
    assert(Bpe.train(unique, "text", merges = 3).count() == 0L)
  }

  test("merged symbols re-tokenize: k merges shrink total symbol count monotonically") {
    val df = docs.toDF("doc_id", "text")
    // Every selected merge has freq >= 2, so each round removes >= 2
    // weighted symbols from the dictionary encoding.
    val merges = Bpe.train(df, "text", merges = 10, minFreq = 2)
      .as[(Long, String, Long)].collect()
    val freqs = merges.map(_._3)
    assert(freqs.forall(_ >= 2L))
  }
}
