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

  test("batched training is bit-identical to sequential at several batch sizes") {
    val df = docs.toDF("doc_id", "text")
    val sequential = Bpe.train(df, "text", merges = 12, minFreq = 2, batch = 1)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    Seq(2, 4, 8, 16).foreach { b =>
      val batched = Bpe.train(df, "text", merges = 12, minFreq = 2, batch = b)
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
      assert(batched == sequential, s"batch=$b diverged from sequential")
    }
  }

  test("batched training: fully disjoint top pairs commit together, list unchanged") {
    // Three disjoint-alphabet words with separated frequencies and no
    // cross pairs: W = 0, C = 0 — the whole batch commits in one round.
    val df = Seq(
      (1L, Seq.fill(100)("ab").mkString(" ")),
      (2L, Seq.fill(60)("cd").mkString(" ")),
      (3L, Seq.fill(30)("ef").mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.train(df, "text", merges = 3, minFreq = 2, batch = 8)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val want = Bpe.referenceMerges(
      Map("ab" -> 100L, "cd" -> 60L, "ef" -> 30L), merges = 3, minFreq = 2)
      .map { case (s, p, f) => (s.toLong, p, f) }
    assert(got == want)
    assert(got.map(_._2) == Seq("a b", "c d", "e f"))
  }

  test("batched training: witness guard catches the created-pair tie hazard") {
    // Adversarial chain: merging (a,d) f=100 converts "adg" into [ad][g],
    // creating pair ("ad","g") at f=50 that TIES the disjoint candidate
    // ("e","f") f=50 and beats it lexicographically ("ad g" < "e f") —
    // an unguarded disjoint-pairs batch would commit ("e","f") second and
    // diverge from sequential training. The W probe sees witness ("d","g")
    // at f=50 and truncates the batch to one merge.
    val df = Seq(
      (1L, Seq.fill(50)("ad").mkString(" ")),
      (2L, Seq.fill(50)("adg").mkString(" ")),
      (3L, Seq.fill(50)("ef").mkString(" "))).toDF("doc_id", "text")
    val wc = Map("ad" -> 50L, "adg" -> 50L, "ef" -> 50L)
    val want = Bpe.referenceMerges(wc, merges = 3, minFreq = 2)
      .map { case (s, p, f) => (s.toLong, p, f) }
    // Sequential ground truth really does pick the created pair second.
    assert(want.map(_._2) == Seq("a d", "ad g", "e f"))
    val got = Bpe.train(df, "text", merges = 3, minFreq = 2, batch = 8)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("batched training equals the reference on random small-alphabet dictionaries") {
    // Raw ScalaCheck Gens with fixed seeds (no scalatest bridge offline).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
    val dictGen = Gen.mapOfN(8, Gen.zip(wordGen, Gen.choose(1L, 9L)))
    (1 to 4).foreach { i =>
      val wc = dictGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = wc.toSeq.zipWithIndex.map { case ((w, n), j) =>
        (j.toLong, Seq.fill(n.toInt)(w).mkString(" "))
      }.toDF("doc_id", "text")
      val want = Bpe.referenceMerges(wc, merges = 6, minFreq = 2)
        .map { case (s, p, f) => (s.toLong, p, f) }
      Seq(3, 8).foreach { b =>
        val got = Bpe.train(df, "text", merges = 6, minFreq = 2, batch = b)
          .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
        assert(got == want, s"sample $i batch=$b diverged: got=$got want=$want")
      }
    }
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
