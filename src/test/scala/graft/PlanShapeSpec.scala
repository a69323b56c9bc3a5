package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan regression guards: the plans that make these operators
 * scale are asserted, not assumed — a refactor that reintroduces a
 * cartesian product, drops a pushed filter, or loses map-side partial
 * aggregation fails here, not in a 100 TB deployment.
 */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to scan, partial aggregation before exchange") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"))
    assert(p.contains("partial_sum"))
  }

  test("q_join_broadcast: dimension side broadcast, no shuffle join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("set-similarity joins never plan a cartesian product") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_allpairs",
      "dedup_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("text ops are scan-projections: no shuffle in per-doc analysis") {
    for (q <- Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a per-row computation")
    }
  }

  test("sessionization partitions by key, never a global window") {
    val p = plan("q_sessionize")
    // a global (empty-partition) window would show 'Window [..] ORDER BY' with
    // SinglePartition distribution; key-partitioned windows hash-partition
    assert(p.contains("hashpartitioning(user_id"))
    assert(!p.contains("SinglePartition"))
  }
}
