package graft

import graft.operators.Ccnet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CcnetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // A corpus where doc 1 repeats the corpus-dominant phrasing (high LM
  // likelihood), doc 2 is one-off word salad (low), doc 3 sits between.
  private val common = "the model reads the data"
  private lazy val corpus = Seq(
    (1L, s"$common\n$common\n$common"),
    (2L, "zyx qwv plk mnb\nvcx asd fgh jkl"),
    (3L, s"$common\nzyx qwv plk mnb")
  ).toDF("doc_id", "text")

  test("bigrams never span a paragraph boundary") {
    // One doc, two paragraphs: the cross-boundary pair (b, c) must not
    // exist, so each paragraph has exactly 1 bigram.
    val scores = Ccnet.paragraphScores(
        Seq((1L, "a b\nc d")).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(scores == Map(0L -> 1L, 1L -> 1L),
      "each paragraph contributes exactly its own bigram")
  }

  test("sub-2-token paragraphs contribute no rows") {
    val scores = Ccnet.paragraphScores(
        Seq((1L, "only\na b c\nx")).toDF("doc_id", "text"), "text", "doc_id")
      .select("para_idx").as[Long].collect().toSet
    assert(scores == Set(1L), "only the 3-token paragraph scores")
  }

  test("partition ranks the corpus-typical doc head and word salad tail") {
    val parts = Ccnet.partition(corpus, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(parts.keySet == Set(1L, 2L, 3L))
    assert(parts(1L)._1 == 1L && parts(1L)._2 == 1L,
      s"repeated common phrasing ranks first (head): $parts")
    assert(parts(2L)._1 == 3L && parts(2L)._2 == 3L,
      s"word salad ranks last (tail): $parts")
    assert(parts(3L)._1 == 2L && parts(3L)._2 == 2L)
  }

  test("partition is deterministic and excludes unscoreable docs") {
    val withEmpty = corpus.union(Seq((9L, "single")).toDF("doc_id", "text"))
    val a = Ccnet.partition(withEmpty, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = Ccnet.partition(withEmpty, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "same input, same partition")
    assert(!a.exists(_.getLong(0) == 9L),
      "a doc with no scoreable paragraph is absent (caller decides)")
  }

  test("lens file drives the CCNet partition (builtin:ccnet_partition)") {
    import graft.engine.Pipeline
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:ccnet_partition",
        |"arguments":{"k":"3"}}]}""".stripMargin)
      .forward(corpus)
    assert(out.columns.toSeq == Seq("doc_id", "n_bigrams", "ll_sum_micro",
      "mean_ll_micro", "rn", "ccnet_bucket"))
    assert(out.count() == 3)
  }
}
