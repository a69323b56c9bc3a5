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

  // Rank-greedy reference encoder: lowest-rank present pair fuses (all
  // occurrences, left-to-right) until no trained pair remains.
  private def referenceEncode(word: String, merges: Seq[String]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms: Seq[String] = word.map(_.toString)
    var done = syms.length < 2
    while (!done) {
      val present = syms.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).filter(rank.contains).toSeq
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(rank)
        val Array(a, b) = best.split(" ", 2)
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toSeq
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  test("encode matches the rank-greedy reference encoder on every document") {
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 8, minFreq = 2)
      .orderBy("step").select("pair").as[String].collect().toSeq
    assert(merges.nonEmpty)
    val got = Bpe.encode(df, "text", "doc_id", merges)
      .as[(Long, Long)].collect().toMap
    val want = docs.map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty)
        .map(w => referenceEncode(w, merges).length.toLong).sum
    }.toMap
    assert(got == want)
    // merges actually compress: fewer subwords than characters
    val charCount = docs.map(_._2.count(_ != ' ').toLong).sum
    assert(got.values.sum < charCount)
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
