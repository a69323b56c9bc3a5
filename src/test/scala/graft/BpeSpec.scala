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
    var syms: Seq[String] = Bpe.codePointSymbols(word)
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

  test("non-BMP text: trainer and encoder share the code-point alphabet") {
    // Two emoji (U+1F600, U+1F680 — surrogate pairs in UTF-16): the
    // trainer's split(word, "") yields code points, so the encoder must
    // too, or trained merges never match at encode time.
    val word = new String(Character.toChars(0x1F600)) +
      new String(Character.toChars(0x1F680))
    val df = Seq((1L, s"$word $word $word"), (2L, s"$word tail")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 3, minFreq = 2)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    val want = Bpe.referenceMerges(
      Map(word -> 4L, "tail" -> 1L), merges = 3, minFreq = 2)
      .map { case (s, p, f) => (s.toLong, p, f) }
    assert(merges == want)
    // first merge fuses the two code points — 4 occurrences of the word
    assert(merges.head._2 ==
      new String(Character.toChars(0x1F600)) + " " +
      new String(Character.toChars(0x1F680)))
    // encoding the merged word yields ONE subword, not 4 lone surrogates
    val mergeList = merges.map(_._2)
    val counts = Bpe.encode(df, "text", "doc_id", mergeList)
      .as[(Long, Long)].collect().toMap
    assert(counts(1L) == 3L, s"each emoji-pair word should be 1 subword: $counts")
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
