package graft.queries

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Similarity-search queries over the `embeddings` table. Exact paths are
 * oracle-checked against DuckDB's own cosine ranking (pair-similarity gaps
 * in this data are ≥2e-5 — far above cross-engine double noise, so ranks
 * and threshold sets are stable). The SRP-LSH path is approximate by
 * construction: rows-only here, recall-tested in SimilaritySpec.
 */
object SimilarityQueries extends QueryProvider {

  // DuckDB-side exact cosine in double, same accumulation shape.
  private val COS =
    """list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |    / (q.nrm * c.nrm)""".stripMargin

  private val NORMED =
    """SELECT vec_id, label, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings""".stripMargin

  private def topkBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.bruteForceTopK(
      corpus = emb, queries = emb.where(col("vec_id") < 10),
      vecCol = "embedding", idCol = "vec_id", k = 5)
  }

  private val topkBruteSql =
    s"""WITH n AS ($NORMED),
       |ranked AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(rank() OVER (PARTITION BY q.vec_id
       |      ORDER BY $COS DESC, c.vec_id) AS BIGINT) AS rk
       |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rk FROM ranked WHERE rk <= 5""".stripMargin

  private def thresholdNbrs(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.thresholdNeighbors(
      corpus = emb, queries = emb.where(col("vec_id") < 50),
      vecCol = "embedding", idCol = "vec_id", threshold = 0.32)
  }

  private val thresholdNbrsSql =
    s"""WITH n AS ($NORMED)
       |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id <> q.vec_id
       |WHERE $COS >= 0.32""".stripMargin

  private def ivfTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(T(s, dir, "embeddings"),
      vecCol = "embedding", idCol = "vec_id", clusterCol = "label", k = 3)

  private val ivfTopkSql =
    s"""WITH n AS ($NORMED),
       |ranked AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(rank() OVER (PARTITION BY q.vec_id
       |      ORDER BY $COS DESC, c.vec_id) AS BIGINT) AS rk
       |  FROM n q JOIN n c ON q.label = c.label AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rk FROM ranked WHERE rk <= 3""".stripMargin

  // The measured multi-probe operating point (recall@10 ≈ 0.85 at ~0.45
  // candidate fraction on this LSH-adversarial near-random corpus;
  // SimilaritySpec pins the floor/ceiling).
  private def srpAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.srpAnn(
      corpus = emb, queries = emb.where(col("vec_id") < 10),
      vecCol = "embedding", idCol = "vec_id", k = 5,
      nPlanes = 8, tables = 16, probes = 9)
  }

  // Trained coarse quantizer: Lloyd's k-means (deterministic hash-seed +
  // fixed-point centroid sums, see graft.operators.Kmeans) clusters the
  // embeddings, then IVF-search runs WITHIN the trained cells — the real
  // scale path where no pre-labelled cluster column exists. Cluster ids
  // depend on the trained model (engine-internal, like sketch values) →
  // rows-only here; SimilaritySpec pins determinism, objective descent,
  // and IVF-over-kmeans recall against brute force.
  private def kmeansIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val cells = graft.operators.Kmeans
      .cluster(emb, "embedding", "vec_id", k = 8, iters = 3)
      .withColumnRenamed("vec_id", "cid").withColumnRenamed("cluster", "cell")
    Similarity.ivfTopK(
      emb.join(cells, emb("vec_id") === cells("cid")).drop("cid"),
      vecCol = "embedding", idCol = "vec_id", clusterCol = "cell", k = 3)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_brute"  -> (topkBrute _),
    "sim_threshold"   -> (thresholdNbrs _),
    "sim_ivf_topk"    -> (ivfTopk _),
    "sim_ivf_kmeans"  -> (kmeansIvf _),
    "sim_ann_srp"     -> (srpAnn _)
  )

  override val oracles: Map[String, String] = Map(
    "sim_topk_brute" -> topkBruteSql,
    "sim_threshold"  -> thresholdNbrsSql,
    "sim_ivf_topk"   -> ivfTopkSql
    // sim_ann_srp: approximate (LSH) — rows-only; recall bound covered in
    // SimilaritySpec against the brute-force baseline.
    // sim_ivf_kmeans: cluster ids come from the trained quantizer
    // (engine-internal) — rows-only; SimilaritySpec pins recall/determinism.
  )
}
