package graft

import graft.operators.EmbeddingQa
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingQaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def emb(rows: (Long, Int, Seq[Float])*) =
    rows.map { case (id, l, v) => (id, l, v.toArray) }
      .toDF("vec_id", "label", "embedding")

  test("labelCentroids: floored mean of shifted quantized components") {
    // label 0: components 0.1 and 0.3 → e = 1100000, 1300000 → mean 1200000
    val df = emb(
      (1L, 0, Seq(0.1f, 0.0f)), (2L, 0, Seq(0.3f, 0.0f)))
    val c = EmbeddingQa.labelCentroids(df, "embedding", "label")
      .as[(Long, Long, Long)].collect().toSet
    // 0.1f and 0.3f widen to doubles slightly off the decimal — mirror the
    // operator's own floor arithmetic
    val e1 = math.floor(0.1f.toDouble * 1e6).toLong + 1000000L
    val e2 = math.floor(0.3f.toDouble * 1e6).toLong + 1000000L
    assert(c == Set((0L, 1L, (e1 + e2) / 2), (0L, 2L, 1000000L)))
  }

  test("confusion: separable clusters give a pure diagonal") {
    val a = (1L to 5L).map(i => (i, 0, Seq(1.0f, 0.0f, 0.0f)))
    val b = (6L to 10L).map(i => (i, 1, Seq(0.0f, 1.0f, 0.0f)))
    val c = (11L to 15L).map(i => (i, 2, Seq(0.0f, 0.0f, 1.0f)))
    val out = EmbeddingQa.confusion(emb(a ++ b ++ c: _*),
      "embedding", "vec_id", "label")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 5L), (1L, 1L, 5L), (2L, 2L, 5L)))
  }

  test("confusion: a mislabeled vector lands in the off-diagonal cell") {
    val a = (1L to 4L).map(i => (i, 0, Seq(1.0f, 0.0f)))
    // id 99 carries label 1 but sits in cluster 0's corner
    val planted = Seq((99L, 1, Seq(1.0f, 0.0f)))
    val b = (6L to 9L).map(i => (i, 1, Seq(0.0f, 1.0f)))
    val out = EmbeddingQa.confusion(emb(a ++ planted ++ b: _*),
      "embedding", "vec_id", "label")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 0L, 1L)), s"planted mislabel missing: $out")
    assert(out.contains((0L, 0L, 4L)) && out.contains((1L, 1L, 4L)))
  }

  test("confusion: argmin tie breaks to the lowest label, deterministically") {
    // one vector equidistant from two one-point clusters ON the grid
    val df = emb(
      (1L, 3, Seq(0.0f)), (2L, 7, Seq(0.2f)),
      (5L, 9, Seq(0.1f)))  // exactly between (after quantization)
    val out1 = EmbeddingQa.confusion(df, "embedding", "vec_id", "label")
      .as[(Long, Long, Long)].collect().toSet
    val out2 = EmbeddingQa.confusion(df, "embedding", "vec_id", "label")
      .as[(Long, Long, Long)].collect().toSet
    assert(out1 == out2)
    // the 0.1 vector's own centroid IS itself → classified as 9
    assert(out1.contains((9L, 9L, 1L)))
  }

  test("lens file drives the confusion audit (builtin:label_confusion)") {
    val df = emb(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.0f)),
      (3L, 1, Seq(0.0f, 1.0f)))
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:label_confusion",
        |  "arguments":{"vec":"embedding","id":"vec_id","label":"label"}}]}"""
        .stripMargin)
      .forward(df).as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("drift: identical snapshots report zero; a shifted label reports " +
      "exactly its quantized displacement") {
    val ref = emb(
      (1L, 0, Seq(0.25f, 0.0f)), (2L, 0, Seq(0.25f, 0.0f)),
      (3L, 1, Seq(0.0f, 0.5f)))
    val same = EmbeddingQa.drift(ref, ref, "embedding", "label")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(same == Set((0L, 2L, 2L, 2L, 0L), (1L, 1L, 1L, 2L, 0L)))
    // current snapshot: label 1 moves +0.5 in dim 1; label 0 unchanged
    val cur = emb(
      (4L, 0, Seq(0.25f, 0.0f)), (5L, 0, Seq(0.25f, 0.0f)),
      (6L, 1, Seq(0.5f, 0.5f)))
    val moved = EmbeddingQa.drift(ref, cur, "embedding", "label")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // dim-1 centroid moves floor(0.5f*1e6) - 0 = 500000 quantized units
    val d = math.floor(0.5f.toDouble * 1e6).toLong
    assert(moved == Set((0L, 2L, 2L, 2L, 0L), (1L, 1L, 1L, 2L, d * d)))
  }

  test("centroidSeparation: pairwise integer L2 matches a hand fit; " +
      "cells agree with drift's math on the same centroids") {
    // three labels on a line in dim 0: centroids at 0, 0.5, 1.2 (scaled)
    val df = emb(
      (1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(0.0f, 0.0f)),
      (3L, 1, Seq(0.5f, 0.0f)),
      (4L, 2, Seq(1.2f, 0.0f)))
    val got = EmbeddingQa.centroidSeparation(df, "embedding", "label",
        scale = 1000000L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong
    val (c0, c1, c2) = (q(0.0f), q(0.5f), q(1.2f))
    assert(got == Map(
      (0L, 1L) -> ((2L, (c1 - c0) * (c1 - c0))),
      (0L, 2L) -> ((2L, (c2 - c0) * (c2 - c0))),
      (1L, 2L) -> ((2L, (c2 - c1) * (c2 - c1)))))
    // every pair is emitted exactly once, a < b
    assert(got.keySet.forall { case (a, b) => a < b })
  }
}
