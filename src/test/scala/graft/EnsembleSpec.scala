package graft

import graft.operators.Ensemble
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EnsembleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("rankSum is the exact Borda sum, ties broken by ascending id") {
    // quality ties between 2 and 3 (id breaks: 2 ranks below 3);
    // length is anti-correlated on purpose — Borda must balance them.
    val df = Seq(
      (1L, 0.9, 10L), // quality rank 4, len rank 1 -> 5
      (2L, 0.5, 40L), // quality rank 2 (tie, lower id), len rank 4 -> 6
      (3L, 0.5, 30L), // quality rank 3 (tie, higher id), len rank 3 -> 6
      (4L, 0.1, 20L)  // quality rank 1, len rank 2 -> 3
    ).toDF("doc_id", "quality", "len")
    val got = Ensemble.rankSum(df, "doc_id", Seq("quality", "len"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (4L, 1L, 5L))
    assert(got(2L) == (2L, 4L, 6L))
    assert(got(3L) == (3L, 3L, 6L))
    assert(got(4L) == (1L, 2L, 3L))
  }

  test("single signal degenerates to that signal's rank") {
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 3.0)).toDF("id", "s")
    val got = Ensemble.rankSum(df, "id", Seq("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("rank_ensemble binds as a lens-file stage (builtin:rank_ensemble)") {
    val df = Seq((1L, 0.9, 2L), (2L, 0.1, 9L)).toDF("doc_id", "q", "n")
    val out = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:rank_ensemble",
        |"arguments":{"signals":["q","n"]}}]}""".stripMargin).forward(df)
    assert(out.columns.toSeq == Seq("doc_id", "q", "n", "rank_sum"))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L), "anti-correlated signals tie")
  }
}
