package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Semantic deduplication over an embedding column — the SemDeDup recipe
 * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
 * through semantic deduplication"): k-means partitions the embedding
 * space, near-duplicate pairs are resolved ONLY within each cell, and one
 * canonical representative per duplicate group survives. Not in the
 * reference (no embedding surface) — SURVEY.md §2.6 north-star addition.
 *
 * This is a pure composition of already-proven parts, which is the point:
 *  - [[Kmeans.train]] — deterministic distributed Lloyd's (hash-order
 *    seeds, fixed-point centroid sums), k·dim driver bytes per round;
 *  - [[org.apache.spark.sql.graft.NearestCentroid]] — codegen'd map-side
 *    cell assignment fused next to the scan;
 *  - [[Dedup.embeddingCosine]] — salted-triangle within-cell pair scoring
 *    (a skewed cell spreads over S(S+1)/2 salt cells, never one task);
 *  - [[Clusters.connectedComponents]] + [[Clusters.survivors]] — log-round
 *    duplicate-group resolution, anti-join keep-one.
 *
 * 100 TB shape: the quadratic term is per-cell, so k tunes the
 * compare-budget (cells of n/k rows ⇒ n²/k comparisons corpus-wide);
 * everything else is the linear scans and bounded shuffles of the parts
 * above. The keep-one choice is min-id (deterministic), not SemDeDup's
 * "random member" — rerun-stability is worth more than faithfulness to a
 * sampling detail.
 */
object SemDedup {

  /** Within-cell near-duplicate pairs (vec_a, vec_b) under a quantizer
   *  trained on the corpus itself. Public so specs can compare the pair
   *  set against unblocked ground truth. */
  def semanticPairs(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, threshold: Double,
      saltBuckets: Int = 8): DataFrame = {
    val centroids = Kmeans.train(df, vecCol, idCol, k, iters)
    val blocked = df.withColumn("__cell",
      org.apache.spark.sql.graft.GraftKmeans
        .nearestCentroid(col(vecCol), centroids))
      .where(col("__cell").isNotNull)
    Dedup.embeddingCosine(blocked, vecCol, idCol, "__cell",
      threshold, saltBuckets)
  }

  /** The corpus with semantic near-duplicates removed: one canonical
   *  (min-id) member survives per duplicate group; rows in no group pass
   *  through untouched. */
  def semantic(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, threshold: Double,
      saltBuckets: Int = 8): DataFrame = {
    val pairs = semanticPairs(df, vecCol, idCol, k, iters, threshold, saltBuckets)
    val cc = Clusters.connectedComponents(pairs, "vec_a", "vec_b")
    Clusters.survivors(df, idCol, cc)
  }
}
