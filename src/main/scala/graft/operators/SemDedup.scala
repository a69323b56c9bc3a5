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

  /** Within-cell near-duplicate pairs (vec_a, vec_b) under a PRE-TRAINED
   *  quantizer — the production entry point: at scale the coarse quantizer
   *  is trained once at ingest and shared between the dedup pass and the
   *  IVF index (see `SimilarityQueries.ivfCentroids`), never retrained per
   *  invocation. */
  def semanticPairs(
      df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      saltBuckets: Int): DataFrame = {
    val blocked = df.withColumn("__cell",
      org.apache.spark.sql.graft.GraftKmeans
        .nearestCentroid(col(vecCol), centroids))
      .where(col("__cell").isNotNull)
    Dedup.embeddingCosine(blocked, vecCol, idCol, "__cell",
      threshold, saltBuckets)
  }

  /** Within-cell near-duplicate pairs (vec_a, vec_b) under a quantizer
   *  trained inline on the corpus itself — the self-contained convenience
   *  form (trains k-means on every call; reuse the centroids overload when
   *  invoking repeatedly). Public so specs can compare the pair set
   *  against unblocked ground truth. */
  def semanticPairs(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, threshold: Double,
      saltBuckets: Int = 8): DataFrame =
    semanticPairs(df, vecCol, idCol,
      Kmeans.train(df, vecCol, idCol, k, iters), threshold, saltBuckets)

  /** The corpus with semantic near-duplicates removed under a PRE-TRAINED
   *  quantizer: one canonical (min-id) member survives per duplicate
   *  group; rows in no group pass through untouched. */
  def semantic(
      df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      saltBuckets: Int): DataFrame = {
    val pairs = semanticPairs(df, vecCol, idCol, centroids, threshold, saltBuckets)
    val cc = Clusters.connectedComponents(pairs, "vec_a", "vec_b")
    Clusters.survivors(df, idCol, cc)
  }

  /** Inline-training form of [[semantic]] (see the k/iters
   *  [[semanticPairs]] note on when to prefer the centroids overload). */
  def semantic(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, threshold: Double,
      saltBuckets: Int = 8): DataFrame =
    semantic(df, vecCol, idCol,
      Kmeans.train(df, vecCol, idCol, k, iters), threshold, saltBuckets)
}
