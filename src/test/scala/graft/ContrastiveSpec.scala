package graft

import graft.operators.Contrastive
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ContrastiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** In-memory replica of the mixer + re-roll — the exact arithmetic the
   *  operator (and the DuckDB oracle) must perform. */
  private def reference(ids: Seq[Long], k: Int): Set[(Long, Long, Long)] = {
    val sorted = ids.sorted
    val rankOf = sorted.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val byRank = sorted.zipWithIndex.map { case (id, i) => (i + 1L) -> id }.toMap
    val n = ids.size.toLong
    (for {
      id <- ids; t <- 1L to k.toLong
      pick0 = ((math.abs(id) % 999959L) * 2891336453L
        + t * 2654435761L) % 4294967296L % n + 1L
      pick = if (pick0 == rankOf(id)) pick0 % n + 1L else pick0
    } yield (id, t, byRank(pick))).toSet
  }

  test("matches the integer reference; never pairs an anchor with itself") {
    val ids = Seq(3L, 17L, 42L, 100L, 999L, 1000001L, 7L)
    val got = Contrastive.negatives(ids.toDF("vec_id"), "vec_id", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == reference(ids, 3))
    assert(got.forall { case (a, _, neg) => a != neg },
      "an anchor must never be its own negative")
    assert(got.groupBy(_._1).forall(_._2.size == 3),
      "exactly k negatives per anchor")
  }

  test("rerun-deterministic") {
    val df = (1L to 50L).toDF("vec_id")
    val a = Contrastive.negatives(df, "vec_id", 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Contrastive.negatives(df, "vec_id", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("negatives binds as a lens-file stage (builtin:negatives)") {
    val df = Seq(1L, 2L, 3L).toDF("vec_id")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:negatives","arguments":{"k":"2"}}]}""")
      .forward(df)
    assert(out.columns.toSeq == Seq("anchor_id", "t", "negative_id"))
    assert(out.count() == 6L)
  }
}
