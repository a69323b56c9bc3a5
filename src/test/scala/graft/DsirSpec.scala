package graft

import graft.operators.Dsir
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val B = 101

  // Corpus with two populations: "science"-flavored docs sharing bigrams
  // with the target, and "cooking"-flavored docs sharing none.
  private def phrase(words: String, reps: Int): String =
    Seq.fill(reps)(words).mkString(" ")

  private lazy val corpus = Seq(
    (1L, phrase("quantum field theory predicts particle interactions", 4)),
    (2L, phrase("field theory predicts measurable quantum effects", 4)),
    (3L, phrase("simmer the tomato sauce with garlic and basil", 4)),
    (4L, phrase("knead the dough slowly then bake until golden", 4)),
    (5L, phrase("quantum effects dominate particle interactions here", 4))
  ).toDF("doc_id", "text")

  private lazy val target = Seq(
    (100L, phrase("quantum field theory predicts particle interactions", 6)),
    (101L, phrase("measurable quantum effects dominate field theory", 6))
  ).toDF("doc_id", "text")

  test("target-matching documents outweigh off-domain documents") {
    val w = Dsir.importanceWeights(corpus, target, "text", "doc_id", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val science = Seq(1L, 2L, 5L).map(w)
    val cooking = Seq(3L, 4L).map(w)
    assert(science.min > cooking.max,
      s"every science doc must outweigh every cooking doc: $w")
  }

  test("target == corpus gives zero weight everywhere (log-ratio identity)") {
    val w = Dsir.importanceWeights(corpus, corpus, "text", "doc_id", B)
    val vals = w.select("w_sum_micro").as[Long].collect()
    assert(vals.nonEmpty && vals.forall(_ == 0L),
      "identical source/target models must cancel exactly")
  }

  test("resample at temperature 0 is hard top-k; Gumbel keys are deterministic") {
    val w = Dsir.importanceWeights(corpus, target, "text", "doc_id", B)
    val top2 = Dsir.resample(w, k = 2, temperature = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val byWeight = w.orderBy(col("w_sum_micro").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().take(2).toSet
    assert(top2 == byWeight)
    // Gumbel path: same seed twice -> identical selection (derandomized)
    val a = Dsir.resample(w, k = 3, temperature = 1.0, seed = 42L)
      .select("doc_id").as[Long].collect().toSeq
    val b = Dsir.resample(w, k = 3, temperature = 1.0, seed = 42L)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b, "same seed must replay the same sample")
  }

  test("short documents (< 2 tokens) contribute no features and score no weight") {
    val c = corpus.union(Seq((9L, "single")).toDF("doc_id", "text"))
    val w = Dsir.importanceWeights(c, target, "text", "doc_id", B)
    assert(!w.select("doc_id").as[Long].collect().contains(9L),
      "a featureless doc has no weight row (caller decides its fate)")
  }

  test("lens file drives DSIR selection end-to-end (builtin:dsir)") {
    import graft.engine.Pipeline
    target.createOrReplaceTempView("dsir_spec_target")
    val kept = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:dsir",
        |"arguments":{"target_table":"dsir_spec_target","mode":"select",
        |"k":"3","buckets":"101"}}]}""".stripMargin)
      .forward(corpus).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L),
      s"selection must keep exactly the science docs, got $kept")
    // weights mode emits the score table instead
    val w = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:dsir",
        |"arguments":{"target_table":"dsir_spec_target","buckets":"101"}}]}"""
        .stripMargin)
      .forward(corpus)
    assert(w.columns.toSeq == Seq("doc_id", "n_feats", "w_sum_micro"))
    assert(w.count() == 5)
  }
}
