package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import scala.util.Random

/**
 * Similarity search over embedding columns (`Array[Float]`) —
 * SURVEY.md §2.6 north-star addition.
 *
 * Three tiers, trading recall for cost:
 *  - `bruteForceTopK` — exact: broadcast the (small) query set, score every
 *    corpus row map-side, per-query top-k. One pass over the corpus, one
 *    shuffle of |queries|·k candidate rows. The baseline and the verifier.
 *  - `ivfTopK` — exact-within-cluster: restrict scoring to the query's
 *    coarse cluster (IVF shape: at 100 TB the cluster id comes from a
 *    trained quantizer; any partitioning column works mechanically).
 *  - `srpAnn` — approximate: sign-random-projection LSH buckets; only
 *    same-bucket rows are scored. Sub-linear candidate sets, recall tested
 *    in SimilaritySpec.
 *
 * All scoring is the codegen'd double-accumulating cosine from TextHash —
 * no UDFs, no driver-side loops.
 */
object Similarity {

  /** Exact top-k neighbors for each query row (query set must be
   *  broadcast-small; neighbors exclude the query itself). Tie-break on
   *  neighbor id keeps ranking deterministic. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = Par.spread(corpus, col(idCol))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", TextHash.cosine("q_vec", "c_vec"))
      .withColumn("rk", rank().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
  }

  /** IVF-shaped search: score only rows in the query's coarse cluster
   *  (`clusterCol`), exact within it. */
  def ivfTopK(
      corpus: DataFrame, vecCol: String, idCol: String, clusterCol: String,
      k: Int): DataFrame = {
    val spreadCorpus = Par.spread(corpus, col(idCol))
    val q = spreadCorpus.select(col(idCol).as("query_id"), col(clusterCol).as("cluster"),
      col(vecCol).as("q_vec"))
    val c = spreadCorpus.select(col(idCol).as("neighbor_id"), col(clusterCol).as("cluster"),
      col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, "cluster")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", TextHash.cosine("q_vec", "c_vec"))
      .withColumn("rk", rank().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
  }

  /** SRP bucket id: bit p of the bucket = sign of <v, plane_p>, over
   *  deterministic (fixed-seed) Gaussian hyperplanes. Native expression —
   *  one primitive loop per row (see o.a.s.sql.graft.SrpBucket); the
   *  interpreted HOF formulation walked a tree per (plane × dim). */
  private def srpBucket(vecCol: String, nPlanes: Int, dim: Int,
      seed: Long): org.apache.spark.sql.Column = {
    val rnd = new Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    org.apache.spark.sql.graft.GraftSrp.srpBucket(col(vecCol), planes)
  }

  /** Approximate top-k via multi-table SRP-LSH: `tables` independent sets
   *  of `nPlanes` hyperplanes; a corpus row is a candidate if it shares a
   *  bucket with the query in ANY table. Recall ≈ 1-(1-p^nPlanes)^tables
   *  where p = 1-θ/π; tune nPlanes (selectivity) vs tables (recall).
   *  Candidates dedupe before scoring, so each is scored once. */
  def srpAnn(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nPlanes: Int = 4, tables: Int = 8, dim: Int = 64): DataFrame = {

    def bucketed(df: DataFrame, id: String, vec: String) = {
      val buckets = (0 until tables).map { t =>
        // independent planes per table via distinct seeds
        struct(lit(t).as("table"),
          srpBucket(vec, nPlanes, dim, seed = 42L + t).as("bucket"))
      }
      df.select(col(id), col(vec),
        explode(array(buckets: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
    }

    val q = bucketed(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec")
    val c = bucketed(
      Par.spread(corpus, col(idCol))
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "neighbor_id", "c_vec")

    val candidates = q.join(c, Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "q_vec", "neighbor_id", "c_vec")
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("cos", TextHash.cosine("q_vec", "c_vec"))
      .withColumn("rk", rank().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
  }

  /** All corpus rows within `threshold` cosine of any query — set-valued
   *  output (ids only), the FP-robust form used for oracle checks. */
  def thresholdNeighbors(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = Par.spread(corpus, col(idCol))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .where(TextHash.cosine("q_vec", "c_vec") >= threshold)
      .select(col("query_id"), col("neighbor_id"))
  }
}
