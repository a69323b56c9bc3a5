package graft

import graft.operators.{Bm25, Hybrid, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion and the multi-query BM25 retrieval leg. */
class HybridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("rrf: hand-computed integer contributions, both-legs beats one-leg") {
    // leg A: q0 -> (7 rk1, 8 rk2); leg B: q0 -> (8 rk1, 9 rk2)
    val a = Seq((0L, 7L, 1L), (0L, 8L, 2L)).toDF("query_id", "doc_id", "rk")
    val b = Seq((0L, 8L, 1L), (0L, 9L, 2L)).toDF("query_id", "doc_id", "rk")
    val out = Hybrid.rrf(Seq(a, b), k0 = 60, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 1000000 DIV 61 = 16393, DIV 62 = 16129
    // doc 8: 16129 + 16393 = 32522 (rank 1 — in both legs)
    // doc 7: 16393 (rank 2, beats doc 9's 16129)
    assert(out == Set((0L, 8L, 32522L, 1L), (0L, 7L, 16393L, 2L),
      (0L, 9L, 16129L, 3L)))
  }

  test("rrf ties break on doc_id; k cuts the fused order") {
    // same single-leg rank => equal rrf => doc_id ascending decides
    val a = Seq((5L, 30L, 1L)).toDF("query_id", "doc_id", "rk")
    val b = Seq((5L, 20L, 1L)).toDF("query_id", "doc_id", "rk")
    val fused = Hybrid.rrf(Seq(a, b), k0 = 60, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(fused == Seq((5L, 20L, 16393L, 1L), (5L, 30L, 16393L, 2L)))
    assert(Hybrid.rrf(Seq(a, b), k0 = 60, k = 1).count() == 1)
  }

  test("searchAllTopK: per-query ranks match single-query searchTopK") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "scan"))
    val all = Bm25.searchAllTopK(docs, "text", "doc_id", queries, k = 15)
      .as[(Long, Long, Long)].collect().toSet
    val single = queries.flatMap { case (q, ts) =>
      Bm25.searchTopK(docs, "text", "doc_id", ts, k = 15)
        .select(col("doc_id"), col("score_micro"))
        .as[(Long, Long)].collect().toSeq
        .sortBy { case (id, sc) => (-sc, id) }
        .zipWithIndex.map { case ((id, _), i) => (q, id, i + 1L) }
    }.toSet
    assert(all == single, "multi-query retrieval diverged from per-query")
  }

  test("ANN-leg hybrid (sim_hybrid_ann) tracks the brute-leg flagship's fusion") {
    // identical lexical leg; the semantic leg swaps brute force for the
    // probed residual-IVFPQ tier (recall ~0.67 at nprobe=32/256), so the
    // fused top-10 sets must agree on well over half their members.
    // Training is deterministic — this is a stable measurement, the
    // floor only guards against testdata regeneration.
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("pipeline_hybrid_rrf")(spark, dir)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.benchQueries("sim_hybrid_ann")(spark, dir)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    val overlap = (exact & ann).size.toDouble / exact.size
    info(f"fused-set overlap (ann vs brute leg): $overlap%.3f")
    assert(overlap >= 0.5, s"overlap $overlap — the ANN leg lost the fusion")
    assert(ann.groupBy(_._1).keySet == Set(0L, 1L, 2L))
  }

  test("hybrid flagship legs: fused docs come only from the legs, ranks 1..k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lex = Bm25.searchAllTopK(docs, "text", "doc_id",
      Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "scan")), k = 10)
    val sem = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 2),
        "embedding", "vec_id", 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
    val fused = Hybrid.rrf(Seq(lex, sem), k0 = 60, k = 5)
      .as[(Long, Long, Long, Long)].collect()
    val legDocs = (lex.as[(Long, Long, Long)].collect() ++
      sem.as[(Long, Long, Long)].collect())
      .map { case (q, d, _) => (q, d) }.toSet
    assert(fused.forall { case (q, d, _, _) => legDocs.contains((q, d)) })
    fused.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    assert(fused.groupBy(_._1).keySet == Set(0L, 1L))
  }
}
