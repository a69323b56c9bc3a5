package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Duplicate-cluster resolution: turns the PAIR output of the dedup
 * operators (`Dedup.minHashLsh` / `simHash` / `ngramJaccard` /
 * `allPairsJaccard` / `embeddingCosine`) into per-document cluster
 * assignments, so a corpus can actually be deduplicated (keep one
 * canonical doc per near-duplicate component, drop the rest).
 *
 * Pairs alone under-delete: near-duplication is not transitive, but
 * training-data dedup treats it as if it were (A≈B, B≈C ⇒ drop two of
 * {A,B,C} even when J(A,C) < t). That closure is a connected-components
 * problem on the pair graph.
 *
 * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
 * O(log n) rounds regardless of component diameter, vs O(diameter) for
 * naive min-label propagation (a 100 TB corpus chained by pairwise
 * near-dups can have long paths; log-round convergence is the difference
 * between 4 and 400 shuffles).
 *
 * Scale shape per round: each star op is one groupBy(min) + one join on
 * node ids — no `collect_list` adjacency arrays anywhere, so a
 * high-degree node (a template duplicated 10⁶ times) never materializes
 * its neighborhood in one task; skew lands in a join, where AQE's skew
 * split handles it. Edges carry two longs. `localCheckpoint` cuts the
 * iterative lineage (on a real cluster with executor loss concerns, swap
 * for reliable `checkpoint` to a DFS dir — same call site).
 *
 * No reference counterpart (the reference has no relational layer);
 * companion to §2.6 dedup (SURVEY.md).
 */
object Clusters {

  /**
   * Connected components over an undirected pair list. Output:
   * `(node, cluster)` — one row per distinct endpoint, `cluster` = the
   * smallest node id in its component (the canonical representative).
   *
   * Convergence is detected by edge-set stability (count + order-free
   * hash-sum checksum); at the fixpoint the edge set is exactly the
   * min-centered star of every component (the SoCC'14 invariant), which
   * is read off as the assignment.
   */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // Canonical undirected edges u < v; self-loops and duplicates dropped.
    var edges = pairs
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u").isNotNull && col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // Order-free edge-set checksum: (count, XOR-fold of per-edge hashes —
    // overflow-free under ANSI, sound over a distinct edge set). One tiny
    // aggregate action per round — never collects edges to the driver.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = checksum(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // LARGE-STAR: center each node c; m(c) = min(neighbors ∪ c); every
      // LARGER neighbor n > c re-attaches to m(c). Each canonical edge is
      // seen once from its smaller endpoint's neighborhood.
      val dir = edges.select(col("u").as("c"), col("v").as("n"))
        .union(edges.select(col("v").as("c"), col("u").as("n")))
      val lsMin = dir.groupBy("c").agg(min(col("n")).as("mn"))
        .select(col("c"), least(col("mn"), col("c")).as("m"))
      val ls = dir.join(lsMin, "c")
        .where(col("n") > col("c"))
        .select(col("m").as("u"), col("n").as("v")) // m ≤ c < n ⇒ canonical
        .distinct()

      // SMALL-STAR on the (now larger→smaller-pointing) edges: center the
      // larger endpoint c = v; m(c) = min of its smaller neighbors; every
      // smaller neighbor AND c itself re-attach to m(c).
      val ssMin = ls.groupBy(col("v").as("c")).agg(min(col("u")).as("m"))
      val ss = ls.select(col("v").as("c"), col("u").as("n"))
        .join(ssMin, "c")
        .select(col("m").as("u"), col("n").as("v"))
        .where(col("u") =!= col("v")) // n = m ⇒ self-loop, drop
        .union(ssMin.select(col("m").as("u"), col("c").as("v")))
        .distinct()
        .localCheckpoint()

      val next = checksum(ss)
      converged = next == sig
      sig = next
      edges = ss
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(O(log n) expected; raise maxIter for adversarial inputs)")

    // Fixpoint edges are min-centered stars: (min, member) per member.
    edges.select(col("v").as("node"), col("u").as("cluster"))
      .union(edges.select(col("u").as("node"), col("u").as("cluster")))
      .distinct()
  }

  /**
   * Materialize the cluster assignment ONCE as a bucketed external table
   * and return it — the shape a real 100 TB pipeline runs: the log-round
   * CC computation happens at ingest, and every consumer (survivor
   * filters, per-cluster stats, canonical-doc joins) reads the
   * `(node, cluster)` table with zero CC stages in its own plan — the
   * consumer plan is a bucketed FileScan plus its join (asserted in
   * ClustersSpec). Bucketing by `node` pre-hashes the column every
   * consumer joins on, so the map side of each later join skips its
   * Exchange entirely.
   *
   * Overwrites `table` if present (re-clustering after a corpus refresh is
   * the normal cadence). The returned DataFrame reads THROUGH the table,
   * never the in-memory lineage.
   */
  def materialize(
      spark: SparkSession, pairs: DataFrame, aCol: String, bCol: String,
      table: String, path: String, buckets: Int = 8): DataFrame = {
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE `$table`")
    connectedComponents(pairs, aCol, bCol)
      .write.bucketBy(buckets, "node").sortBy("node")
      .option("path", path).mode(SaveMode.Overwrite)
      .saveAsTable(table)
    spark.table(table)
  }

  /**
   * Keep one canonical document per duplicate cluster: drops every row
   * whose id is a non-canonical member of `clusters` (`node ≠ cluster`);
   * rows never seen in a pair pass through untouched. Left-anti join on
   * ids only — the document payload never enters the dedup shuffle.
   */
  def survivors(docs: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.where(col("node") =!= col("cluster"))
        .select(col("node").as(idCol)),
      Seq(idCol), "left_anti")

  /**
   * Keep the BEST member per duplicate cluster instead of the min-id one
   * — the policy real pipelines run ("keep the longest / highest-quality
   * copy"). `score` is any deterministic Column over the document row;
   * ties break toward the lower id so the survivor set stays
   * rerun-stable. Rows never seen in a pair pass through untouched.
   *
   * 100 TB shape: the argmax runs over a SLIM (id, score, cluster)
   * projection — cluster-partitioned window, bounded by the largest
   * duplicate family — and the winners semi-join back by id, so the
   * document payload crosses no dedup shuffle (same discipline as
   * `survivors`).
   */
  def survivorsBy(docs: DataFrame, idCol: String, clusters: DataFrame,
      score: Column): DataFrame = {
    val slim = docs.select(col(idCol), score.as("__score"))
      .join(clusters.select(col("node").as(idCol), col("cluster")),
        Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("cluster"), col(idCol)))
    val w = Window.partitionBy(col("__grp"))
      .orderBy(col("__score").desc, col(idCol))
    val keep = slim.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /**
   * INCREMENTAL cluster-map maintenance: fold a batch of newly discovered
   * duplicate pairs into an existing `(node, cluster)` map without
   * re-clustering the corpus — the continuous-ingest face of
   * [[connectedComponents]]/[[materialize]]. At 100 TB the full log-round
   * CC over every historical edge is an ingest-time-only event; per-batch
   * maintenance must touch work proportional to the BATCH, not the
   * corpus, or the pipeline can't keep up with its own input.
   *
   * Only clusters containing an endpoint of a new edge can change (no new
   * edge touches any member of the others), so the corpus-sized map
   * splits into an untouched part that passes through without ANY CC
   * stage (a broadcast anti-join on the affected cluster ids is its whole
   * plan) and a touched part — affected-cluster membership stars plus the
   * new edges — that re-clusters through the normal log-round CC. The
   * star edges (cluster, member) preserve exactly the connectivity the
   * old map proved, so the result is bit-identical to a full recompute
   * over (old edges ∪ new edges): min-id labels, merged clusters
   * relabeled to the smaller min, brand-new nodes clustered among
   * themselves. Certified by `dedup_cluster_update`, whose oracle IS the
   * full-recompute CC.
   *
   * Broadcast budget: the new-edge endpoint set and the affected cluster
   * id set are batch-bounded (that is the premise of incremental
   * ingest); the touched-member volume is bounded by the affected
   * clusters' sizes — duplicate families, small by construction.
   */
  def addEdges(map: DataFrame, newPairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    // Batch-bounded by the incremental-ingest premise, and referenced by
    // the endpoint set AND the star recompute below — checkpoint once so
    // the (possibly expensive) pair-mining lineage behind `newPairs`
    // never re-executes per reference. `map` is the caller's concern:
    // production reads it from the materialized cluster table
    // ([[materialize]]), so its re-reads are file scans.
    val edges = newPairs
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u").isNotNull && col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val endpoints = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node"))).distinct()
    val affected = map
      .join(broadcast(endpoints), Seq("node"), "left_semi")
      .select(col("cluster")).distinct()
    val untouched = map.join(broadcast(affected), Seq("cluster"), "left_anti")
      .select(col("node"), col("cluster"))
    val touchedStars = map.join(broadcast(affected), Seq("cluster"), "left_semi")
      .select(col("cluster").as("u"), col("node").as("v"))
    val recomputed = connectedComponents(
      touchedStars.union(edges), "u", "v")
    untouched.union(recomputed.select(col("node"), col("cluster")))
  }
}
