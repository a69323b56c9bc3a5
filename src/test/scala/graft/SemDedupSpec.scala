package graft

import graft.operators.{Clusters, Dedup, SemDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // Three tight duplicate families along distinct axes plus lone points:
  // cosine within a family ≈ 1, across families / to lone points ≤ ~0.7.
  private def corpus: DataFrame = {
    def v(x: Double, y: Double, z: Double, w: Double) =
      Array(x.toFloat, y.toFloat, z.toFloat, w.toFloat)
    Seq(
      (1L, v(1, 0.01, 0, 0)), (2L, v(1, 0.02, 0, 0)), (3L, v(1, 0.03, 0, 0)),
      (10L, v(0, 1, 0.01, 0)), (11L, v(0, 1, 0.02, 0)),
      (20L, v(0, 0, 1, 0.01)), (21L, v(0, 0, 1, 0.02)),
      (30L, v(0.6, 0.6, 0.4, 0.2)),
      (31L, v(0.2, 0.4, 0.6, 0.6))
    ).toDF("vec_id", "embedding")
  }

  test("semantic: k=1 equals unblocked brute-force dedup (ground truth)") {
    val df = corpus
    val brutePairs = Dedup.embeddingCosine(
      df.withColumn("one", lit(0)), "embedding", "vec_id", "one",
      threshold = 0.99, saltBuckets = 1)
    val bruteSurvivors = Clusters
      .survivors(df, "vec_id", Clusters.connectedComponents(brutePairs, "vec_a", "vec_b"))
      .select("vec_id").as[Long].collect().toSet
    val sem = SemDedup.semantic(df, "embedding", "vec_id",
      k = 1, iters = 2, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(sem == bruteSurvivors)
    assert(sem == Set(1L, 10L, 20L, 30L, 31L)) // min id survives per family
  }

  test("semantic: blocking with k>1 keeps the family structure") {
    // Families are axis-aligned and far apart — any trained quantizer with
    // enough cells keeps each family in one cell, so survivors match the
    // unblocked answer.
    val sem = SemDedup.semantic(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(sem == Set(1L, 10L, 20L, 30L, 31L))
  }

  test("lens file drives semantic_dedup end-to-end (builtin:semantic_dedup)") {
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:semantic_dedup",
        |  "arguments":{"vec":"embedding","id":"vec_id",
        |               "k":3,"iters":3,"threshold":0.99}}]}""".stripMargin)
    val out = pipe.forward(corpus).select("vec_id").as[Long].collect().toSet
    assert(out == Set(1L, 10L, 20L, 30L, 31L))
  }

  test("semantic: pre-trained centroids overload equals inline training") {
    val centroids = graft.operators.Kmeans
      .train(corpus, "embedding", "vec_id", k = 3, iters = 3)
    val viaTrained = SemDedup.semantic(corpus, "embedding", "vec_id",
      centroids, threshold = 0.99, saltBuckets = 8)
      .select("vec_id").as[Long].collect().toSet
    val inline = SemDedup.semantic(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(viaTrained == inline)
    val pairsTrained = SemDedup.semanticPairs(corpus, "embedding", "vec_id",
      centroids, threshold = 0.99, saltBuckets = 8)
      .as[(Long, Long)].collect().toSet
    val pairsInline = SemDedup.semanticPairs(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(pairsTrained == pairsInline)
  }

  test("semantic: deterministic across reruns; survivors+dropped partition the corpus") {
    val a = SemDedup.semantic(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99).select("vec_id").as[Long].collect().toSet
    val b = SemDedup.semantic(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99).select("vec_id").as[Long].collect().toSet
    assert(a == b)
    val all = corpus.select("vec_id").as[Long].collect().toSet
    val pairs = SemDedup.semanticPairs(corpus, "embedding", "vec_id",
      k = 3, iters = 3, threshold = 0.99)
    val dropped = Clusters.connectedComponents(pairs, "vec_a", "vec_b")
      .where(col("node") =!= col("cluster")).select(col("node").cast("long"))
      .as[Long].collect().toSet
    assert((a intersect dropped).isEmpty)
    assert((a union dropped) == all)
  }
}
