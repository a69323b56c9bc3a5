package graft

import graft.operators.Clusters
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("transitive closure: a chain collapses to one cluster under min id") {
    // A≈B, B≈C, C≈D — no direct A≈D pair, but dedup must treat it as one
    // component. Pair order and orientation are deliberately scrambled.
    val got = cc(Seq((3L, 2L), (1L, 2L), (4L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate components stay separate; duplicates and self-loops ignored") {
    val got = cc(Seq((5L, 9L), (9L, 5L), (5L, 5L), (20L, 30L), (30L, 25L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 20L -> 20L, 25L -> 20L, 30L -> 20L))
  }

  test("long path converges within the log-round budget (not O(diameter))") {
    // Path of 60 nodes: naive min-propagation needs ~60 rounds; the
    // large-star/small-star alternation must finish far inside maxIter=12.
    val path = (0L until 59L).map(i => (i, i + 1))
    val got = Clusters.connectedComponents(path.toDF("a", "b"), "a", "b",
      maxIter = 12).as[(Long, Long)].collect().toMap
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("empty pair set yields empty assignment without iterating") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("materialized cluster map: consumer plan has zero CC stages and matches inline") {
    // The pipeline shape: cluster once at ingest (materialize), filter many.
    // The consumer must read the assignment as a bucketed FileScan — no
    // localCheckpoint scans (how CC's iterative lineage shows up in plans)
    // and no aggregation rounds.
    val dir = "/root/testdata/sf0.01"
    graft.queries.DedupQueries.ensureClusterMap(spark, dir)
    val consumer = SparkEntry.queries("dedup_survivors_from_map")(spark, dir)
    val plan = consumer.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      "consumer plan contains a checkpointed CC stage — the map is not being reused")
    assert(plan.contains("g_cluster_map") || plan.contains("cluster_map"),
      "consumer plan does not scan the materialized cluster-map table")
    // Bucketing by node pre-hashes the map side of the anti-join: the scan
    // must carry the bucket spec instead of an Exchange above it.
    assert(plan.contains("Bucketed: true"),
      "cluster-map scan is not bucket-aware")

    val fromMap = consumer.as[(String, Long)].collect().toMap
    val inline = SparkEntry.queries("dedup_survivors")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(fromMap.nonEmpty)
    assert(fromMap == inline)
  }

  test("survivors keeps the canonical member and untouched rows") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "alone"))
      .toDF("doc_id", "text")
    val clusters = Clusters.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
    val kept = Clusters.survivors(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L)) // 2,3 dropped; 9 never paired, passes through
  }

  test("survivorsBy keeps the best-scoring member per cluster, ties to lower id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaa"),   // cluster {1,2,3}: 2 longest
      (10L, "bb"), (11L, "bb"),                 // cluster {10,11}: tie -> 10
      (20L, "untouched loner")                  // no pairs
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "cluster")
    val kept = graft.operators.Clusters
      .survivorsBy(docs, "doc_id", clusters,
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 20L))
  }

  private def addE(map: Map[Long, Long],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.addEdges(map.toSeq.toDF("node", "cluster"),
        newPairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("addEdges equals a full recompute over old ∪ new edges") {
    val old = Seq((1L, 2L), (5L, 6L), (10L, 11L), (11L, 12L))
    val batchCases = Seq(
      Seq((2L, 5L)),                 // merge two clusters
      Seq((20L, 21L)),               // brand-new nodes, own cluster
      Seq((12L, 20L), (20L, 5L)),    // chain new node into two merges
      Seq((1L, 2L)),                 // already-known edge: no-op
      Seq((3L, 1L), (3L, 10L)))      // new node bridging two clusters
    for (batch <- batchCases) {
      assert(addE(cc(old), batch) == cc(old ++ batch), s"batch=$batch")
    }
  }

  test("addEdges leaves unaffected clusters byte-identical and CC-free") {
    val map = cc(Seq((1L, 2L), (100L, 101L)))
    val out = Clusters.addEdges(map.toSeq.toDF("node", "cluster"),
      Seq((1L, 3L)).toDF("a", "b"), "a", "b")
    // the untouched (100,101) cluster survives verbatim
    val got = out.as[(Long, Long)].collect().toMap
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 100L -> 100L, 101L -> 100L))
  }

  test("addEdges merging relabels the union to the smaller min id") {
    val map = cc(Seq((5L, 6L), (2L, 9L)))
    val got = addE(map, Seq((6L, 9L)))
    assert(got.values.toSet == Set(2L), s"merged cluster must take min id: $got")
  }
}
