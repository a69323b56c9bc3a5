package graft

import graft.operators.Pagerank
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PagerankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val ONE = 1000000000L

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    Pagerank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** In-memory integer replica of one power iteration — the exact
   *  arithmetic the operator (and the DuckDB oracle) must perform. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var pr = nodes.map(_ -> ONE / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outdeg.contains).map(pr).sum
      val inflow = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      pr = nodes.map { v =>
        v -> ((15L * (ONE / n)) / 100L +
          (85L * (inflow.getOrElse(v, 0L) + dang / n)) / 100L)
      }.toMap
    }
    pr
  }

  test("matches the integer reference on a mixed graph with dangling nodes") {
    // 1→2, 1→3, 2→3, 3→4; 4 is dangling (its mass redistributes).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(ranks(edges) == reference(edges, 5))
  }

  test("symmetric cycle converges to equal ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val r = ranks(edges, iters = 10)
    assert(r.values.toSet.size == 1, s"cycle nodes must tie: $r")
  }

  test("a sink pointed at by everyone outranks its sources") {
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 2L))
    val r = ranks(edges)
    assert(r(9L) > r(1L) && r(9L) > r(2L) && r(9L) > r(3L))
  }

  test("duplicate edges collapse to one") {
    val once = ranks(Seq((1L, 2L), (2L, 1L), (1L, 3L)))
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L)))
    assert(once == dup)
  }

  test("rerun-deterministic") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(ranks(edges) == ranks(edges))
  }

  test("NULL endpoints are not nodes: a null-dst edge neither dangles " +
      "nor counts toward outdegree") {
    import org.apache.spark.sql.functions.{col, when}
    val clean = Seq((1L, 2L), (2L, 1L), (1L, 3L))
    val expected = ranks(clean)
    // same edges plus a (1, null) row — the fused dangling sentinel must
    // not absorb its contribution, and node 1's outdegree must stay 2
    val dirty = (clean :+ (1L, -1L)).toDF("src", "dst")
      .select(col("src"),
        when(col("dst") === -1L, null).otherwise(col("dst")).as("dst"))
    val got = Pagerank.run(dirty, "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "null-dst edge leaked into the rank math")
  }

  private def wranks(edges: Seq[(Long, Long, Long)],
      iters: Int = 5): Map[Long, Long] =
    Pagerank.runWeighted(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("runWeighted: all-weights-1 equals the unweighted run exactly") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(wranks(edges.map(e => (e._1, e._2, 1L))) == ranks(edges))
  }

  test("runWeighted: rank follows the heavy edge; duplicate edges pre-sum") {
    // 1 splits 9:1 between 2 and 3 -> node 2 outranks node 3.
    val w = wranks(Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
    assert(w(2L) > w(3L))
    // (1,2,4)+(1,2,5) pre-sums to (1,2,9)
    val dup = wranks(Seq((1L, 2L, 4L), (1L, 2L, 5L), (1L, 3L, 1L),
      (2L, 1L, 1L), (3L, 1L, 1L)))
    assert(dup == w)
    // non-positive weights are dropped, not divided by
    val zed = wranks(Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L),
      (3L, 1L, 1L), (1L, 4L, 0L)))
    assert(zed == w && !zed.contains(4L)) // the w=0 edge (and node 4) vanish
  }
}
