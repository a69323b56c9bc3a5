package graft

import graft.operators.Bm25
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark spark spark is mentioned repeatedly in this much longer " +
      "document about spark and its spark runtime behavior"),
    (3L, "ducks swim on the quiet pond"),
    (4L, "the cluster runs spark jobs")).toDF("doc_id", "text")

  private def scores(terms: Seq[String]): Map[Long, Long] =
    Bm25.score(corpus, "text", "doc_id", terms)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("matches the hand-computed Okapi formula on a tiny corpus") {
    // Corpus: N=4, dl = (6, 18, 6, 5), avgdl = 35/4 = 8.75; 'spark' df=3.
    val s = scores(Seq("spark"))
    val idf = math.log(1.0 + (4.0 - 3.0 + 0.5) / (3.0 + 0.5))
    def contrib(tf: Double, dl: Double): Long =
      math.floor(1e6 * idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * dl / 8.75))).toLong
    assert(s(1L) == contrib(1, 6))
    assert(s(2L) == contrib(5, 18))
    assert(s(3L) == 0L, "zero tf scores exactly zero")
    assert(s(4L) == contrib(1, 5))
  }

  test("term-frequency saturation: 5 occurrences score < 5x one occurrence") {
    val s = scores(Seq("spark"))
    assert(s(2L) > s(1L), "more occurrences still score higher")
    assert(s(2L) < 5L * s(4L), "but sub-linearly (k1 saturation)")
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val s = scores(Seq("spark"))
    assert(s(4L) > s(1L), "tf=1 in dl=5 beats tf=1 in dl=6")
  }

  test("rarer terms carry higher idf weight") {
    // 'ducks' df=1 vs 'spark' df=3, equal tf=1, same doc lengths would
    // be ideal; compare within one doc: doc 3 scores 'ducks' higher than
    // doc 1 scores 'spark' despite identical tf and dl.
    val ducks = scores(Seq("ducks"))(3L)
    val spark1 = scores(Seq("spark"))(1L)
    assert(ducks > spark1)
  }

  test("searchTopK returns exactly the score()-ranked head") {
    // Retrieval must agree bit-for-bit with the corpus-sweep scorer:
    // same docs, same scores, in (score desc, id asc) order.
    val terms = Seq("spark", "cluster")
    val sweep = Bm25.score(corpus, "text", "doc_id", terms)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .filter(_._2 != 0L) // zero-tf docs never enter the postings
      .sortBy { case (id, s) => (-s, id) }
    val got = Bm25.searchTopK(corpus, "text", "doc_id", terms, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == sweep.take(2).toSeq)
  }

  test("searchTopK k beyond matches returns every matching doc only") {
    val got = Bm25.searchTopK(corpus, "text", "doc_id", Seq("ducks"), k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L), "only the matching doc, not zero-score fill")
  }

  test("searchTopK ties break on ascending doc id") {
    val tied = Seq((5L, "alpha beta"), (2L, "alpha beta"), (9L, "alpha beta"))
      .toDF("doc_id", "text")
    val got = Bm25.searchTopK(tied, "text", "doc_id", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 5L))
  }

  test("multi-term scores are the exact sum of single-term scores") {
    val both = scores(Seq("spark", "cluster"))
    val a = scores(Seq("spark"))
    val b = scores(Seq("cluster"))
    corpus.select("doc_id").as[Long].collect().foreach { id =>
      assert(both(id) == a(id) + b(id), s"doc $id")
    }
  }

  test("searchAnd: only docs with EVERY term; n_hits counts occurrences") {
    val df = Seq(
      (1L, "spark cluster spark"),  // both terms, 3 hits
      (2L, "spark only here"),      // missing 'cluster'
      (3L, "cluster cluster"),      // missing 'spark'
      (4L, "no match at all")
    ).toDF("doc_id", "text")
    val got = graft.operators.Bm25
      .searchAnd(df, "text", "doc_id", Seq("spark", "cluster"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L))
  }

  test("vocabGrowth: first-seen tokens attribute to their earliest batch") {
    val df = Seq(
      (0L, "a b"), (1L, "a c"),      // batch 0: distinct {a,b,c}, new 3
      (2L, "a d"), (3L, "b e")       // batch 1: distinct {a,b,d,e}, new 2
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .vocabGrowth(df, "text", "doc_id", batchSize = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 3L, 3L), (1L, 4L, 2L)))
  }
}
