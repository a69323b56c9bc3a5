package graft.operators

import org.apache.spark.sql.graft.GraftKmeans
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Distributed Lloyd's k-means over an embedding column — the trainer for
 * the IVF coarse quantizer that `Similarity.ivfTopK` consumes (SURVEY.md
 * §2.6 similarity: the "scale path" cluster ids come from a trained
 * quantizer; this is that trainer, so ANN no longer depends on a
 * pre-labelled cluster column).
 *
 * Fully deterministic, by construction rather than by luck:
 *  - init picks the k seed vectors in `xxhash64(id)` order (the same
 *    portable hash-order trick as `Sampling` membership) — no RNG state;
 *  - per-dimension centroid sums accumulate in FIXED-POINT
 *    (`floor(x·2²⁴)` as BIGINT): integer addition commutes, so centroids
 *    are invariant to partition count, row order, and rerun — a
 *    double-sum would drift with shuffle nondeterminism and flip
 *    boundary assignments between runs.
 *
 * 100 TB shape, per iteration: one narrow scan with the codegen'd k·dim
 * FMA argmin ([[org.apache.spark.sql.graft.NearestCentroid]]) fused next
 * to the parquet read, then posexplode → partial-agg: the exchange
 * carries at most k·dim rows PER MAP PARTITION (map-side combine folds
 * the n·dim exploded rows immediately), and k·dim longs land on the
 * driver — the same bytes the next broadcast ships anyway. No iteration
 * state bigger than the centroid matrix; `iters` is a fixed small
 * constant (Lloyd's converges in practice in ≤10 rounds at any scale).
 * Empty clusters keep their previous centroid (never NaN).
 */
object Kmeans {

  /** 2²⁴ fixed-point units per 1.0 — float32 has 24 mantissa bits, so for
   *  embeddings in [-1, 1] this loses nothing the input had. */
  private val FixedScale: Double = (1L << 24).toDouble

  /** Deterministic seed centroids: the k vectors with the smallest
   *  `xxhash64(id)` (global TakeOrdered of k tiny rows). Dirty rows —
   *  null vectors, null elements, or a dimension differing from the
   *  corpus's first clean row — are filtered BEFORE the TakeOrdered, so a
   *  corrupt row among the k smallest hashes degrades to the next seed
   *  instead of an NPE here or a `rectangular` failure in the argmin
   *  (train() already tolerates such rows via NearestCentroid's null). */
  def seed(df: DataFrame, vecCol: String, idCol: String, k: Int): Array[Array[Double]] = {
    require(k >= 1, "need k >= 1")
    val clean = df
      .where(col(vecCol).isNotNull &&
        !exists(col(vecCol), _.isNull) && size(col(vecCol)) > 0)
    // Reference dim = the clean row with the smallest hash (deterministic,
    // same order the seeds use), not an arbitrary "first" row.
    val dim = clean
      .select(size(col(vecCol)).as("d"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(1).select(col("d")).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException(
        s"no non-null '$vecCol' rows to seed k-means from")
    }
    val seeds = clean.where(size(col(vecCol)) === dim)
      .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.length == k,
      s"only ${seeds.length} clean $dim-dim vectors available for k=$k seeds")
    seeds
  }

  /** `iters` Lloyd rounds from the hash-order seeds; returns the trained
   *  centroid matrix (k × dim doubles). */
  def train(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 5): Array[Array[Double]] = {
    require(iters >= 0, "need iters >= 0")
    var centroids = seed(df, vecCol, idCol, k)
    val dim = centroids(0).length
    for (_ <- 1 to iters) {
      val sums: Array[Row] = df
        .select(GraftKmeans.nearestCentroid(col(vecCol), centroids).as("cluster"),
          col(vecCol).as("v"))
        .where(col("cluster").isNotNull)
        .select(col("cluster"), posexplode(col("v")))
        .toDF("cluster", "dim", "x")
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(floor(col("x").cast("double") * FixedScale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val (c, d) = (r.getInt(0), r.getInt(1))
        next(c)(d) = r.getLong(2).toDouble / FixedScale / r.getLong(3).toDouble
      }
      centroids = next
    }
    centroids
  }

  /** Map-side assignment of every row to its nearest trained centroid:
   *  (id, cluster) — the IVF cell map / dedup-blocking column. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol),
      GraftKmeans.nearestCentroid(col(vecCol), centroids).cast("long").as("cluster"))

  /** Train + assign in one call. Two driver-visible phases by nature (the
   *  assignment plan needs the finished centroids), like the Bloom build. */
  def cluster(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 5): DataFrame =
    assign(df, vecCol, idCol, train(df, vecCol, idCol, k, iters))

  /** The trained centroids as a DataFrame — (cell, vals): cell index and
   *  the dim-wide centroid — the relational form a catalog stores and a
   *  cross-engine oracle reads (mirrors [[Pq.codebooksDf]]). */
  def centroidsDf(s: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    val rows = centroids.zipWithIndex.map { case (vals, cell) =>
      (cell.toLong, vals.toSeq)
    }
    s.createDataFrame(rows.toSeq).toDF("cell", "vals")
  }

  /** Within-cluster sum of squares (the Lloyd objective) — convergence
   *  metric for specs/monitoring; one narrow scan + scalar aggregate. */
  def cost(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): Double =
    df.select(sum(GraftKmeans.nearestCentroidDist(col(vecCol), centroids)).as("c"))
      .head.getDouble(0)
}
