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

  /** MATRYOSHKA (MRL) TRUNCATION RECALL — the QA behind the modern
   *  cheap-first-stage retrieval pattern: rank once with the FULL
   *  64-dim cosine and once with only the FIRST 16 DIMS (an MRL-style
   *  prefix slice — its own norms, its own ranking), then measure
   *  per-query top-k agreement. Both rankings run through the same
   *  `bruteForceTopK` machinery (map-side partial top-k, no window),
   *  and the oracle replays BOTH rank orders (cosine desc, id
   *  tiebreak) plus the overlap count — so the slice arithmetic, the
   *  prefix norms, and the agreement math all hash-check. An operator
   *  reads `n_overlap` to size the rerank window a truncated
   *  first stage needs. 100 TB shape: identical to sim_topk_brute
   *  twice — query side broadcast, corpus never shuffles, exchanges
   *  carry ≤ k·16 B per (partition × query). */
  private def mrlRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val emb16 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val full = Similarity.bruteForceTopK(
        corpus = emb, queries = emb.where(col("vec_id") < 10),
        vecCol = "embedding", idCol = "vec_id", k = 5)
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(col("neighbor_id"))).as("f"))
    val pref = Similarity.bruteForceTopK(
        corpus = emb16, queries = emb16.where(col("vec_id") < 10),
        vecCol = "embedding", idCol = "vec_id", k = 5)
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(col("neighbor_id"))).as("p"))
    full.join(pref, Seq("query_id"))
      .select(col("query_id"),
        array_join(col("f"), ",").as("full_ids"),
        array_join(col("p"), ",").as("prefix_ids"),
        size(array_intersect(col("f"), col("p"))).cast("long")
          .as("n_overlap"))
  }

  private val mrlRecallSql =
    s"""WITH n AS ($NORMED),
       |n16 AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(range(1, 17),
       |      i -> CAST(embedding[i] AS DOUBLE)
       |        * CAST(embedding[i] AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |rf AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    rank() OVER (PARTITION BY q.vec_id
       |      ORDER BY $COS DESC, c.vec_id) AS rk
       |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |rp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    rank() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_sum(list_transform(range(1, 17),
       |        i -> CAST(q.embedding[i] AS DOUBLE)
       |          * CAST(c.embedding[i] AS DOUBLE)))
       |        / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
       |  FROM n16 q JOIN n16 c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |f AS (
       |  SELECT query_id, string_agg(CAST(neighbor_id AS VARCHAR), ','
       |    ORDER BY neighbor_id) AS full_ids
       |  FROM rf WHERE rk <= 5 GROUP BY query_id),
       |p AS (
       |  SELECT query_id, string_agg(CAST(neighbor_id AS VARCHAR), ','
       |    ORDER BY neighbor_id) AS prefix_ids
       |  FROM rp WHERE rk <= 5 GROUP BY query_id),
       |ov AS (
       |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM (SELECT query_id, neighbor_id FROM rf WHERE rk <= 5) a
       |  JOIN (SELECT query_id, neighbor_id FROM rp WHERE rk <= 5) b
       |    USING (query_id, neighbor_id)
       |  GROUP BY a.query_id)
       |SELECT f.query_id, f.full_ids, p.prefix_ids,
       |  CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap
       |FROM f JOIN p USING (query_id)
       |LEFT JOIN ov USING (query_id)""".stripMargin

  // Embedding drift: per-label centroid shift between the even-id
  // (reference) and odd-id (current) snapshot halves — the pre-reindex
  // audit. All-integer (shift + floored means, the EmbeddingQa
  // discipline), so the oracle refits BOTH centroid sets and replays the
  // squared-distance sum exactly.
  private def driftQ(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.EmbeddingQa.drift(
      ref = emb.where(col("vec_id") % 2 === 0),
      cur = emb.where(col("vec_id") % 2 === 1),
      vecCol = "embedding", labelCol = "label", scale = 1000000L)
  }

  private val driftSql =
    """WITH q AS (
      |  SELECT vec_id, label, r.range AS i,
      |    CAST(floor(CAST(embedding[r.range] AS DOUBLE) * 1000000) AS BIGINT)
      |      + 1000000 AS e
      |  FROM embeddings, range(1, 65) r
      |), rc AS (
      |  SELECT CAST(label AS BIGINT) AS label, i, sum(e) // count(*) AS c_ref
      |  FROM q WHERE vec_id % 2 = 0 GROUP BY 1, 2
      |), cc AS (
      |  SELECT CAST(label AS BIGINT) AS label, i, sum(e) // count(*) AS c_cur
      |  FROM q WHERE vec_id % 2 = 1 GROUP BY 1, 2
      |), j AS (
      |  SELECT rc.label, rc.c_ref, cc.c_cur FROM rc JOIN cc USING (label, i)
      |), d AS (
      |  SELECT label, count(*) AS n_dims,
      |    CAST(sum((c_ref - c_cur) * (c_ref - c_cur)) AS BIGINT) AS drift_l2sq
      |  FROM j GROUP BY 1
      |), nr AS (
      |  SELECT CAST(label AS BIGINT) AS label, count(*) AS n_ref
      |  FROM embeddings WHERE vec_id % 2 = 0 GROUP BY 1
      |), nc AS (
      |  SELECT CAST(label AS BIGINT) AS label, count(*) AS n_cur
      |  FROM embeddings WHERE vec_id % 2 = 1 GROUP BY 1
      |)
      |SELECT d.label, nr.n_ref, nc.n_cur, d.n_dims, d.drift_l2sq
      |FROM d JOIN nr USING (label) JOIN nc USING (label)""".stripMargin

  /** Inter-centroid separation matrix — the geometry audit next to
   *  sim_confusion: C(10,2)=45 integer squared-L2 cells between label
   *  centroids, exact cross-engine (same quantization as sim_drift). */
  private def centroidSepQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingQa.centroidSeparation(
      T(s, dir, "embeddings"), "embedding", "label", scale = 1000000L)

  private val centroidSepSql =
    """WITH q AS (
      |  SELECT label, r.range AS i,
      |    CAST(floor(CAST(embedding[r.range] AS DOUBLE) * 1000000) AS BIGINT)
      |      + 1000000 AS e
      |  FROM embeddings, range(1, 65) r
      |), c AS (
      |  SELECT CAST(label AS BIGINT) AS label, i, sum(e) // count(*) AS c
      |  FROM q GROUP BY 1, 2
      |)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  count(*) AS n_dims,
      |  CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist_l2sq
      |FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
      |GROUP BY 1, 2""".stripMargin

  /** Cluster-separation audit: per label, tightness vs own centroid,
   *  distance to the nearest foreign centroid, and the strictly-
   *  separated vector count — integer-exact, the oracle refits
   *  centroids and replays every distance. */
  private def separationQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingQa.separationAudit(
      T(s, dir, "embeddings"), "embedding", "vec_id", "label",
      scale = 1000000L)

  private val separationSql =
    """WITH q AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label, r.range AS i,
      |    CAST(floor(CAST(embedding[r.range] AS DOUBLE) * 1000000) AS BIGINT)
      |      + 1000000 AS e
      |  FROM embeddings, range(1, 65) r
      |), c AS (
      |  SELECT label AS clabel, i, sum(e) // count(*) AS c
      |  FROM q GROUP BY 1, 2
      |), d AS (
      |  SELECT q.vec_id, q.label, c.clabel,
      |    CAST(sum((q.e - c.c) * (q.e - c.c)) AS BIGINT) AS d2
      |  FROM q JOIN c ON q.i = c.i GROUP BY 1, 2, 3
      |), own AS (
      |  SELECT vec_id, label, d2 AS own_d2 FROM d WHERE label = clabel
      |), oth AS (
      |  SELECT vec_id, label, min(d2) AS min_other_d2
      |  FROM d WHERE label <> clabel GROUP BY 1, 2
      |)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(own_d2) AS BIGINT) AS sum_own_d2,
      |  CAST(sum(min_other_d2) AS BIGINT) AS sum_other_d2,
      |  CAST(count(*) FILTER (WHERE min_other_d2 > own_d2) AS BIGINT)
      |    AS n_separated
      |FROM own JOIN oth USING (vec_id, label) GROUP BY 1""".stripMargin

  // Binary sign-bit tier: Hamming-prefilter (top-40 of 8-byte signatures)
  // then exact-cosine rerank to top-5. Both cuts are total orders, so the
  // oracle replays sign-packing (as per-dimension sign disagreement ≡
  // bit_count(xor)), the prefilter rank AND the rerank, rank-for-rank —
  // the hash certifies the whole two-stage funnel.
  private def binaryTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.binaryHammingTopK(
      corpus = emb, queries = emb.where(col("vec_id") < 10),
      vecCol = "embedding", idCol = "vec_id", k = 5, rerank = 40)
  }

  private val binaryTopkSql =
    s"""WITH n AS ($NORMED),
       |h AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    len(list_filter(range(1, 65),
       |      i -> (q.embedding[i] > 0) <> (c.embedding[i] > 0))) AS hamming
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |pre AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      rank() OVER (PARTITION BY query_id
       |        ORDER BY hamming, neighbor_id) AS hrk
       |    FROM h) WHERE hrk <= 40),
       |ranked AS (
       |  SELECT p.query_id, p.neighbor_id,
       |    CAST(rank() OVER (PARTITION BY p.query_id
       |      ORDER BY $COS DESC, c.vec_id) AS BIGINT) AS rk
       |  FROM pre p
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN n c ON c.vec_id = p.neighbor_id)
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
  // embeddings, then probed-IVF search visits each query's nprobe nearest
  // trained cells — the real scale path where no pre-labelled cluster
  // column exists. nprobe=6 of k=16 cells scans ~0.38 of the corpus per
  // query and lifts recall@5 from the ~0.44 single-cell floor to ~0.72
  // (SimilaritySpec pins recall ≥ 0.7 at ≤ 0.5 candidate fraction).
  // Cluster ids depend on the trained model (engine-internal, like sketch
  // values) → rows-only here; SimilaritySpec pins determinism, objective
  // descent, and recall.
  private def kmeansIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    // Same trained model as the IVF×PQ path — memoized per (session, dir)
    // as ingest-time work (the quantizer is trained once and shared, the
    // 100 TB discipline; previously retrained per invocation).
    Similarity.ivfProbedTopK(emb, emb, vecCol = "embedding",
      idCol = "vec_id", centroids = ivfCentroids(s, dir), k = 3, nprobe = 6)
  }

  // Product quantization: codebooks train once per (session, sf dir) —
  // PQ training is ingest-time work like the cluster map — so the query
  // measures ADC search over the 8-byte-code index. Codes/ranks depend on
  // the trained codebook (engine-internal) → rows-only; PqSpec pins code
  // shape, determinism, self-cosine, and recall vs brute force.
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  private def pqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => graft.operators.Pq.train(T(s, dir, "embeddings"),
        "embedding", "vec_id", m = 16, ksub = 16, iters = 2))

  private def pqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Pq.topK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", pqCodebooks(s, dir), k = 5)
  }

  // IVF×PQ (FAISS-IVFPQ layout): coarse cells prune, PQ codes compress —
  // the corpus index is one cell id + m small ints per row. Both models
  // memoized as ingest-time work; rows-only (trained-model internals),
  // PqSpec pins cell containment + full-probe ≡ exhaustive-ADC.
  private val ivfCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def ivfCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    ivfCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => graft.operators.Kmeans.train(T(s, dir, "embeddings"),
        "embedding", "vec_id", k = 16, iters = 3))

  private def ivfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Pq.ivfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", ivfCentroids(s, dir), pqCodebooks(s, dir),
      k = 5, nprobe = 6)
  }

  // Cross-engine certification of the ADC search math. The trained
  // codebooks and codes are engine-internal (sim_pq_topk stays
  // rows-only), but GIVEN them, reconstruction + cosine ranking is
  // exactly replayable: Spark materializes the code index and the
  // codebook table (Scratch.materialize), searches the index it wrote,
  // and the oracle reconstructs each row from the SAME parquet
  // (flatten sub-centroids in sub order) and ranks with the same
  // dot/(sqrt·sqrt) shape — certifying PqAdcCosine against a from-first-
  // principles SQL formulation.
  private def pqAdcVerify(s: SparkSession, dir: String): DataFrame = {
    val cbs = pqCodebooks(s, dir)
    val emb = T(s, dir, "embeddings")
    Scratch.materialize(s, dir, "pq_codebooks",
      graft.operators.Pq.codebooksDf(s, cbs))
    val idxPath = Scratch.materialize(s, dir, "pq_index",
      graft.operators.Pq.encode(emb, "embedding", "vec_id", cbs)
        .select(col("vec_id").as("neighbor_id"), col("codes")))
    graft.operators.Pq.searchIndex(s.read.parquet(idxPath),
      emb.where(col("vec_id") < 10), "embedding", "vec_id", cbs, k = 5)
  }

  private val pqAdcVerifySql =
    s"""WITH cb AS (SELECT sub, code, vals
       |  FROM read_parquet('${Scratch.oraclePath("pq_codebooks")}/*.parquet')),
       |idx AS (SELECT neighbor_id, codes
       |  FROM read_parquet('${Scratch.oraclePath("pq_index")}/*.parquet')),
       |ic AS (
       |  SELECT neighbor_id, CAST(i1 - 1 AS INT) AS sub, c AS code FROM (
       |    SELECT neighbor_id,
       |      unnest(list_transform(codes, (x, i) -> i)) AS i1,
       |      unnest(codes) AS c
       |    FROM idx)),
       |recon AS (
       |  SELECT ic.neighbor_id, flatten(list(cb.vals ORDER BY ic.sub)) AS r
       |  FROM ic JOIN cb ON cb.sub = ic.sub AND cb.code = ic.code
       |  GROUP BY ic.neighbor_id),
       |rn AS (SELECT neighbor_id, r,
       |    sqrt(list_sum(list_transform(r, x -> x * x))) AS nr FROM recon),
       |qn AS (SELECT vec_id AS query_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT qn.query_id, rn.neighbor_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qn.embedding[i] AS DOUBLE) * rn.r[i]))
       |      / (qn.nq * rn.nr) AS cos
       |  FROM qn JOIN rn ON rn.neighbor_id <> qn.query_id)
       |SELECT query_id, neighbor_id, rk FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  // Cross-engine certification of the composed IVF×PQ search: cell ids
  // and codes are trained-model internals (sim_ivfpq_topk stays
  // rows-only), but GIVEN the materialized (neighbor_id, cell, codes)
  // index and the query-side probe lists, cell pruning is an exact
  // integer join and ADC ranking replays from the codebook table —
  // certifying the full production layout (coarse prune × compressed
  // verify) end to end.
  private def ivfPqVerify(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.{GraftKmeans, GraftPq}
    val cbs = pqCodebooks(s, dir)
    val cents = ivfCentroids(s, dir)
    val emb = T(s, dir, "embeddings")
    Scratch.materialize(s, dir, "pq_codebooks",
      graft.operators.Pq.codebooksDf(s, cbs))
    val idxPath = Scratch.materialize(s, dir, "ivfpq_index",
      emb.select(col("vec_id").as("neighbor_id"),
        GraftKmeans.nearestCentroid(col("embedding"), cents).as("cell"),
        GraftPq.pqEncode(col("embedding"), cbs).as("codes"))
        .where(col("cell").isNotNull && col("codes").isNotNull))
    val probePath = Scratch.materialize(s, dir, "ivfpq_probes",
      emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          explode(GraftKmeans.nearestCentroids(col("embedding"), cents, 6))
            .as("cell")))
    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    // The cut goes through the same map-side partial top-k the production
    // searches use (Similarity.cutTopK) — so the hash check certifies the
    // aggregate's (cos desc, neighbor_id) order against DuckDB's rank().
    graft.operators.Similarity.cutTopK(
      s.read.parquet(probePath)
        .join(s.read.parquet(idxPath), "cell")
        .where(col("neighbor_id") =!= col("query_id"))
        .join(q, "query_id")
        .withColumn("cos",
          GraftPq.pqAdcCosine(col("q_vec"), col("codes"), cbs)),
      5)
  }

  private val ivfPqVerifySql =
    s"""WITH cb AS (SELECT sub, code, vals
       |  FROM read_parquet('${Scratch.oraclePath("pq_codebooks")}/*.parquet')),
       |idx AS (SELECT neighbor_id, cell, codes
       |  FROM read_parquet('${Scratch.oraclePath("ivfpq_index")}/*.parquet')),
       |probes AS (SELECT query_id, cell
       |  FROM read_parquet('${Scratch.oraclePath("ivfpq_probes")}/*.parquet')),
       |ic AS (
       |  SELECT neighbor_id, CAST(i1 - 1 AS INT) AS sub, c AS code FROM (
       |    SELECT neighbor_id,
       |      unnest(list_transform(codes, (x, i) -> i)) AS i1,
       |      unnest(codes) AS c
       |    FROM idx)),
       |recon AS (
       |  SELECT ic.neighbor_id, flatten(list(cb.vals ORDER BY ic.sub)) AS r
       |  FROM ic JOIN cb ON cb.sub = ic.sub AND cb.code = ic.code
       |  GROUP BY ic.neighbor_id),
       |rn AS (SELECT neighbor_id, r,
       |    sqrt(list_sum(list_transform(r, x -> x * x))) AS nr FROM recon),
       |qn AS (SELECT vec_id AS query_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
       |  FROM embeddings WHERE vec_id < 10),
       |cand AS (
       |  SELECT probes.query_id, idx.neighbor_id
       |  FROM probes JOIN idx ON probes.cell = idx.cell
       |  WHERE idx.neighbor_id <> probes.query_id),
       |scored AS (
       |  SELECT qn.query_id, rn.neighbor_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qn.embedding[i] AS DOUBLE) * rn.r[i]))
       |      / (qn.nq * rn.nr) AS cos
       |  FROM cand
       |  JOIN qn ON qn.query_id = cand.query_id
       |  JOIN rn ON rn.neighbor_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, rk FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  // Residual (IVF-centered) PQ — codes quantize v − centroid(cell), the
  // FAISS IVFPQ composition: the same 4-bit-per-subspace budget spends
  // itself on the residual ball instead of the whole space (measured
  // recall@5 at identical per-row bytes: 0.344 plain → 0.64 residual at
  // 256 coarse cells; PqSpec pins ≥ 0.5). Coarse quantizer and residual
  // codebooks memoized as ingest-time work like the rest of the family.
  private val rpqCells = 256
  private val rpqCentCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def rpqCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    rpqCentCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => graft.operators.Kmeans.train(T(s, dir, "embeddings"),
        "embedding", "vec_id", k = rpqCells, iters = 3))

  private val rpqCbCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  private def rpqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    rpqCbCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => graft.operators.Pq.trainResidual(T(s, dir, "embeddings"),
        "embedding", "vec_id", rpqCentroids(s, dir), m = 16, ksub = 16,
        iters = 3))

  private def rpqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    graft.operators.Pq.residualIvfTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", rpqCentroids(s, dir), rpqCodebooks(s, dir),
      k = 5, nprobe = 32)
  }

  // Cross-engine certification of the residual-ADC math: cells, codes and
  // codebooks are trained-model internals (sim_rpq_topk stays bench-only),
  // but GIVEN the materialized centroid VALUES, residual codebooks and
  // (neighbor_id, cell, codes) index, the reconstruction is
  // `cent[i] + sub_centroid[i]` — the oracle adds the SAME double
  // operands in the same order and replays the cosine ranking.
  private def rpqAdcVerify(s: SparkSession, dir: String): DataFrame = {
    val cents = rpqCentroids(s, dir)
    val cbs = rpqCodebooks(s, dir)
    val emb = T(s, dir, "embeddings")
    Scratch.materialize(s, dir, "rpq_codebooks",
      graft.operators.Pq.codebooksDf(s, cbs))
    Scratch.materialize(s, dir, "rpq_centroids",
      graft.operators.Pq.centroidsDf(s, cents))
    val idxPath = Scratch.materialize(s, dir, "rpq_index",
      graft.operators.Pq.encodeResidual(emb, "embedding", "vec_id", cents, cbs)
        .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes")))
    graft.operators.Pq.searchResidualIndex(s.read.parquet(idxPath),
      emb.where(col("vec_id") < 10), "embedding", "vec_id", cents, cbs, k = 5)
  }

  private val rpqAdcVerifySql =
    s"""WITH cb AS (SELECT sub, code, vals
       |  FROM read_parquet('${Scratch.oraclePath("rpq_codebooks")}/*.parquet')),
       |cents AS (SELECT cell, vals
       |  FROM read_parquet('${Scratch.oraclePath("rpq_centroids")}/*.parquet')),
       |idx AS (SELECT neighbor_id, cell, codes
       |  FROM read_parquet('${Scratch.oraclePath("rpq_index")}/*.parquet')),
       |ic AS (
       |  SELECT neighbor_id, CAST(i1 - 1 AS INT) AS sub, c AS code FROM (
       |    SELECT neighbor_id,
       |      unnest(list_transform(codes, (x, i) -> i)) AS i1,
       |      unnest(codes) AS c
       |    FROM idx)),
       |rsub AS (
       |  SELECT ic.neighbor_id, flatten(list(cb.vals ORDER BY ic.sub)) AS rs
       |  FROM ic JOIN cb ON cb.sub = ic.sub AND cb.code = ic.code
       |  GROUP BY ic.neighbor_id),
       |recon AS (
       |  SELECT idx.neighbor_id,
       |    list_transform(range(1, 65), i -> cents.vals[i] + rsub.rs[i]) AS r
       |  FROM idx JOIN cents ON idx.cell = cents.cell
       |  JOIN rsub ON rsub.neighbor_id = idx.neighbor_id),
       |rn AS (SELECT neighbor_id, r,
       |    sqrt(list_sum(list_transform(r, x -> x * x))) AS nr FROM recon),
       |qn AS (SELECT vec_id AS query_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT qn.query_id, rn.neighbor_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qn.embedding[i] AS DOUBLE) * rn.r[i]))
       |      / (qn.nq * rn.nr) AS cos
       |  FROM qn JOIN rn ON rn.neighbor_id <> qn.query_id)
       |SELECT query_id, neighbor_id, rk FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  /**
   * Composition flagship over the round-8 ANN tier: residual-PQ-assisted
   * near-duplicate CLUSTERING — the scale path of embedding dedup. The
   * funnel: IVF-cell blocking (candidates = same coarse cell, the
   * blocking the corpus index already provides) → residual-ADC prefilter
   * (one exact vector against the other side's m-int codes, codegen'd
   * per pair — no second float vector touched) → exact-cosine verify on
   * the prefilter's survivors only → connected components → canonical
   * min-id survivor per cluster. SemDeDup's shape with the compressed
   * tier doing the quadratic part: at 100 TB the in-cell pair space
   * scores against 16-byte codes, and full vectors are re-read only for
   * the prefiltered sliver. Thresholds sit in measured distribution
   * gaps (ADC 0.35: gap ≥ 1.1e-3; exact 0.402: the dedup_embedding gap)
   * so the >= comparisons are FP-safe cross-engine. The oracle replays
   * the WHOLE funnel — reconstruction from the materialized codebook/
   * centroid/index tables, both cosine stages, and the transitive
   * closure as a recursive CTE — so the hash certifies the composition.
   */
  private val annDedupAdcTau = 0.35
  private val annDedupExactTau = 0.402
  private def annDedupQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.GraftPq
    val cents = rpqCentroids(s, dir)
    val cbs = rpqCodebooks(s, dir)
    val emb = T(s, dir, "embeddings")
    Scratch.materialize(s, dir, "rpq_codebooks",
      graft.operators.Pq.codebooksDf(s, cbs))
    Scratch.materialize(s, dir, "rpq_centroids",
      graft.operators.Pq.centroidsDf(s, cents))
    val idxPath = Scratch.materialize(s, dir, "rpq_index",
      graft.operators.Pq.encodeResidual(emb, "embedding", "vec_id", cents, cbs)
        .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes")))
    // The quadratic stage routes through the salted triangle (a hot IVF
    // cell spreads over S(S+1)/2 salt cells); output is salt-independent
    // (id-canonical ADC direction), so the oracle's plain a < b join
    // replays it unchanged.
    val verified = graft.operators.Pq.residualNearDupPairs(
      s.read.parquet(idxPath)
        .select(col("neighbor_id").as("vec_id"), col("cell"), col("codes")),
      emb, "embedding", "vec_id", cents, cbs,
      annDedupAdcTau, annDedupExactTau, saltBuckets = 4)
    graft.operators.Clusters.connectedComponents(verified, "a", "b")
      .select(col("node").cast("long").as("vec_id"),
        col("cluster").cast("long").as("survivor_id"))
  }

  private val annDedupSql =
    s"""WITH RECURSIVE cb AS MATERIALIZED (SELECT sub, code, vals
       |  FROM read_parquet('${Scratch.oraclePath("rpq_codebooks")}/*.parquet')),
       |cents AS MATERIALIZED (SELECT cell, vals
       |  FROM read_parquet('${Scratch.oraclePath("rpq_centroids")}/*.parquet')),
       |idx AS MATERIALIZED (SELECT neighbor_id, cell, codes
       |  FROM read_parquet('${Scratch.oraclePath("rpq_index")}/*.parquet')),
       |ic AS (SELECT neighbor_id, CAST(i1 - 1 AS INT) AS sub, c AS code FROM (
       |    SELECT neighbor_id,
       |      unnest(list_transform(codes, (x, i) -> i)) AS i1,
       |      unnest(codes) AS c FROM idx)),
       |rsub AS (SELECT ic.neighbor_id, flatten(list(cb.vals ORDER BY ic.sub)) AS rs
       |  FROM ic JOIN cb ON cb.sub = ic.sub AND cb.code = ic.code
       |  GROUP BY ic.neighbor_id),
       |recon AS MATERIALIZED (SELECT idx.neighbor_id,
       |    list_transform(range(1, 65), i -> cents.vals[i] + rsub.rs[i]) AS r
       |  FROM idx JOIN cents ON idx.cell = cents.cell
       |  JOIN rsub ON rsub.neighbor_id = idx.neighbor_id),
       |rn AS MATERIALIZED (SELECT neighbor_id, r,
       |    sqrt(list_sum(list_transform(r, x -> x * x))) AS nr FROM recon),
       |n AS MATERIALIZED (SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |cand AS (SELECT ia.neighbor_id AS a, ib.neighbor_id AS b FROM idx ia
       |  JOIN idx ib ON ia.cell = ib.cell AND ia.neighbor_id < ib.neighbor_id),
       |pre AS (SELECT cand.a, cand.b FROM cand
       |  JOIN n qa ON qa.vec_id = cand.a
       |  JOIN rn rb ON rb.neighbor_id = cand.b
       |  WHERE list_sum(list_transform(range(1, 65),
       |      i -> CAST(qa.embedding[i] AS DOUBLE) * rb.r[i])) / (qa.nrm * rb.nr)
       |    >= $annDedupAdcTau),
       |ver AS MATERIALIZED (SELECT pre.a, pre.b FROM pre
       |  JOIN n na ON na.vec_id = pre.a JOIN n nb ON nb.vec_id = pre.b
       |  WHERE list_sum(list_transform(range(1, 65),
       |      i -> CAST(na.embedding[i] AS DOUBLE) * CAST(nb.embedding[i] AS DOUBLE)))
       |    / (na.nrm * nb.nrm) >= $annDedupExactTau),
       |e AS (SELECT a AS u, b AS v FROM ver UNION SELECT b, a FROM ver),
       |reach(node, r) AS (
       |  SELECT u, u FROM e
       |  UNION
       |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
       |)
       |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS survivor_id
       |FROM reach GROUP BY node""".stripMargin

  // Cross-engine certification of the SRP candidate/verify math: bucket
  // ids are engine-internal (sim_ann_srp stays rows-only), but GIVEN the
  // materialized corpus buckets and query probe lists the candidate set
  // is an exact integer join, and the cosine verify runs on the original
  // embeddings both engines share. Threshold output (ids only) instead of
  // top-k: the candidate set — the part under test — determines the
  // result with no rank-tie sensitivity.
  private def srpVerify(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val cPath = Scratch.materialize(s, dir, "srp_corpus_buckets",
      Similarity.srpCorpusBuckets(emb, "embedding", "vec_id",
        nPlanes = 8, tables = 16).select("neighbor_id", "tbl", "bucket"))
    val qPath = Scratch.materialize(s, dir, "srp_query_probes",
      Similarity.srpQueryProbes(emb.where(col("vec_id") < 10),
        "embedding", "vec_id", nPlanes = 8, tables = 16, probes = 9)
        .select("query_id", "tbl", "bucket"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    s.read.parquet(qPath).join(s.read.parquet(cPath), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
      .join(vecs.select(col("vec_id").as("query_id"),
        col("embedding").as("q_vec")), "query_id")
      .join(vecs.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_vec")), "neighbor_id")
      .where(graft.functions.TextHash.cosine("q_vec", "c_vec") >= 0.32)
      .select("query_id", "neighbor_id")
  }

  private val srpVerifySql =
    s"""WITH cbk AS (SELECT * FROM
       |  read_parquet('${Scratch.oraclePath("srp_corpus_buckets")}/*.parquet')),
       |p AS (SELECT * FROM
       |  read_parquet('${Scratch.oraclePath("srp_query_probes")}/*.parquet')),
       |cand AS (
       |  SELECT DISTINCT p.query_id, cbk.neighbor_id
       |  FROM p JOIN cbk ON p.tbl = cbk.tbl AND p.bucket = cbk.bucket
       |  WHERE cbk.neighbor_id <> p.query_id),
       |n AS ($NORMED)
       |SELECT cand.query_id, cand.neighbor_id
       |FROM cand
       |JOIN n q ON q.vec_id = cand.query_id
       |JOIN n c ON c.vec_id = cand.neighbor_id
       |WHERE $COS >= 0.32""".stripMargin

  // Cross-engine certification of the trained-quantizer search math —
  // the companion that closes sim_ivf_kmeans's rows-only gap. The
  // centroid VALUES are trained-model internals (that query stays
  // rows-only), but GIVEN the materialized centroid table, everything
  // downstream is exactly replayable from first principles: DuckDB
  // recomputes every row's squared-L2 argmin cell (certifying
  // NearestCentroid), each query's nprobe-nearest cells (certifying
  // NearestCentroids' arg-top-n), and the cosine top-k over the probed
  // candidate union — the complete probed-IVF pipeline. Pair distances in
  // this corpus are far above double noise, so argmin/rank are stable
  // cross-engine (same reasoning as the exact-cosine oracles above).
  private def kmeansVerify(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCentroids(s, dir)
    val emb = T(s, dir, "embeddings")
    Scratch.materialize(s, dir, "kmeans_centroids",
      graft.operators.Kmeans.centroidsDf(s, cents))
    Similarity.ivfProbedTopK(emb, emb.where(col("vec_id") < 10),
      "embedding", "vec_id", cents, k = 3, nprobe = 6)
  }

  private val kmeansVerifySql =
    s"""WITH ct AS (SELECT cell, vals
       |  FROM read_parquet('${Scratch.oraclePath("kmeans_centroids")}/*.parquet')),
       |n AS ($NORMED),
       |d AS (
       |  SELECT n.vec_id, ct.cell,
       |    list_sum(list_transform(range(1, 65),
       |      i -> (CAST(n.embedding[i] AS DOUBLE) - ct.vals[i])
       |         * (CAST(n.embedding[i] AS DOUBLE) - ct.vals[i]))) AS dist
       |  FROM n CROSS JOIN ct),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      rank() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS r
       |    FROM d)
       |  WHERE r = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell,
       |      rank() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS r
       |    FROM d WHERE vec_id < 10)
       |  WHERE r <= 6),
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.query_id
       |  JOIN n c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, rk FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 3""".stripMargin

  // Int8 quantization (Quantize.int8): floor-based codes are exact
  // integers in both engines, so codes AND the double scale hash-match.
  // The library API returns one array row per vector; the registered
  // query posexplodes it to (vec_id, scale, idx, code) rows because the
  // driver's comparator sorts column values and cannot sort a top-level
  // array cell — same math, comparator-safe shape.
  /** JL ±1 random projection to 16 integer components — the sign matrix
   *  is mixer-derived, so DuckDB replays every component exactly. */
  private def randomProjQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.randomProject(
      T(s, dir, "embeddings"), "embedding", "vec_id", dOut = 16)

  private val randomProjSql =
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |q AS (SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
      |  FROM embeddings CROSS JOIN dims),
      |ds AS (SELECT unnest(range(0, 16)) AS j)
      |SELECT vec_id, CAST(j AS BIGINT) AS j,
      |  CAST(sum(CASE WHEN (((i * 16 + j) % 999983) * 2654435761)
      |                     % 4294967296 < 2147483648
      |      THEN q ELSE -q END) AS BIGINT) AS comp
      |FROM q CROSS JOIN ds GROUP BY vec_id, j""".stripMargin

  private def quantizeInt8(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantize.int8(T(s, dir, "embeddings"), "embedding", "vec_id")
      .select(col("vec_id"), col("scale"),
        posexplode(col("q")).as(Seq("idx", "code")))
      .withColumn("idx", col("idx").cast("long"))

  private val quantizeInt8Sql =
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
      |      AS scale
      |  FROM embeddings),
      |codes AS (
      |  SELECT vec_id, scale,
      |    CASE
      |      WHEN embedding IS NULL THEN NULL
      |      WHEN scale > 0 THEN list_transform(embedding,
      |        x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale) AS BIGINT))
      |      ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
      |    END AS q
      |  FROM s)
      |SELECT vec_id, scale, CAST(i1 - 1 AS BIGINT) AS idx, code FROM (
      |  SELECT vec_id, scale,
      |    unnest(list_transform(q, (x, i) -> i)) AS i1,
      |    unnest(q) AS code
      |  FROM codes)""".stripMargin

  // Cluster-balanced diversity downsampling (Sampling.clusterBalanced —
  // the D4-style density equalizer) over the shared IVF quantizer: dense
  // k-means cells thin toward 12 rows, sparse cells survive whole,
  // membership via the fourth independent integer mixer. GIVEN the
  // materialized centroid table the whole chain is replayable from first
  // principles: DuckDB recomputes every row's argmin cell, the cell
  // sizes, the floor(1e6·target/size) micro-rate, and the mixer compare.
  private def clusterBalanceQ(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCentroids(s, dir)
    Scratch.materialize(s, dir, "balance_centroids",
      graft.operators.Kmeans.centroidsDf(s, cents))
    graft.operators.Sampling.clusterBalanced(
      T(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", cents, targetPerCell = 12L)
      // array columns don't survive the driver comparator's sort — emit
      // only the scalar (vec_id, cell) membership.
      .select(col("vec_id"), col("cell"))
  }

  private val clusterBalanceSql =
    s"""WITH ct AS (SELECT cell, vals
       |  FROM read_parquet('${Scratch.oraclePath("balance_centroids")}/*.parquet')),
       |d AS (
       |  SELECT e.vec_id, ct.cell,
       |    list_sum(list_transform(range(1, 65),
       |      i -> (CAST(e.embedding[i] AS DOUBLE) - ct.vals[i])
       |         * (CAST(e.embedding[i] AS DOUBLE) - ct.vals[i]))) AS dist
       |  FROM embeddings e CROSS JOIN ct),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      rank() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS r
       |    FROM d)
       |  WHERE r = 1),
       |sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n
       |  FROM asg GROUP BY cell)
       |SELECT asg.vec_id, asg.cell
       |FROM asg JOIN sz ON asg.cell = sz.cell
       |WHERE ((abs(vec_id) % 999961) * 3432918353) % 4294967296 % 1000000
       |  < least(1000000,
       |      CAST(floor(1000000.0 * 12 / CAST(cell_n AS DOUBLE)) AS BIGINT))""".stripMargin

  // Deterministic contrastive negatives (Contrastive.negatives): 4 picks
  // per anchor via the fifth integer mixer over the GlobalSequence rank
  // space, self-picks re-rolled one step. The oracle replays ranks,
  // mixer, re-roll, and the rank join — every pair is exact.
  private def negativesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Contrastive.negatives(
      T(s, dir, "embeddings").select(col("vec_id")), "vec_id", k = 4)

  private val negativesSql =
    """WITH r AS (SELECT vec_id,
      |    CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS rn
      |  FROM embeddings),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM r),
      |c AS (SELECT vec_id, rn, nn, CAST(t AS BIGINT) AS t,
      |    ((abs(vec_id) % 999959) * 2891336453
      |      + CAST(t AS BIGINT) * 2654435761) % 4294967296 % nn + 1 AS pick0
      |  FROM r CROSS JOIN n CROSS JOIN (SELECT unnest(range(1, 5)) AS t)),
      |p AS (SELECT vec_id, t,
      |    CASE WHEN pick0 = rn THEN pick0 % nn + 1 ELSE pick0 END AS pick
      |  FROM c)
      |SELECT p.vec_id AS anchor_id, p.t, r2.vec_id AS negative_id
      |FROM p JOIN r r2 ON p.pick = r2.rn""".stripMargin

  // Nearest-centroid label confusion (EmbeddingQa.confusion): integer
  // quantized+shifted components, per-label floored-mean centroids, exact
  // squared distances, (dist2, label) argmin — the oracle replays the
  // entire classifier from the raw parquet floats.
  private def labelConfusionQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingQa.confusion(
      T(s, dir, "embeddings"), "embedding", "vec_id", "label")

  private val labelConfusionSql =
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |e AS (SELECT vec_id AS vid, CAST(label AS BIGINT) AS label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
      |      + 1000000 AS e
      |  FROM embeddings CROSS JOIN dims),
      |cent AS (SELECT label AS clabel, i,
      |    CAST(sum(e) // count(*) AS BIGINT) AS c
      |  FROM e GROUP BY label, i),
      |d AS (SELECT e.vid, e.label, cent.clabel,
      |    sum((e.e - cent.c) * (e.e - cent.c)) AS dist2
      |  FROM e JOIN cent ON e.i = cent.i GROUP BY e.vid, e.label, cent.clabel),
      |r AS (SELECT vid, label, clabel,
      |    row_number() OVER (PARTITION BY vid ORDER BY dist2, clabel) AS rk
      |  FROM d)
      |SELECT label, clabel AS pred, CAST(count(*) AS BIGINT) AS n
      |FROM r WHERE rk = 1 GROUP BY label, clabel""".stripMargin

  /**
   * HYBRID-RETRIEVAL flagship (round 9): the standard two-leg hybrid
   * search — BM25 lexical retrieval ⊕ exact embedding-cosine retrieval,
   * fused by reciprocal-rank fusion — run as one query. Three queries,
   * each a (term list, probe vector) pair over doc/vec id alignment:
   * the lexical leg is [[graft.operators.Bm25.searchAllTopK]] (postings
   * discipline, integer micro-unit scores, map-side partial cut), the
   * semantic leg is [[Similarity.bruteForceTopK]] (the recall ceiling —
   * swap in the residual-IVFPQ tier at corpus scale; it excludes the
   * probe doc itself, whose cosine of 1 is noise for retrieval), and
   * [[graft.operators.Hybrid.rrf]] sums `1000000 DIV (60 + rank)` per
   * leg. Everything after the legs is integer, so the oracle replays
   * BOTH retrievals rank-for-rank AND the fusion arithmetic — the hash
   * certifies the composition end to end.
   */
  private val rrfTermQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join", "window"),
    1L -> Seq("hash", "scan", "filter"),
    2L -> Seq("vector", "stream", "batch"))
  private val rrfLegK = 20
  private val rrfK0 = 60
  private val rrfK = 10
  private val rrfBm25K1 = 1.2
  private val rrfBm25B = 0.75

  private def hybridRrfQ(s: SparkSession, dir: String): DataFrame = {
    val lex = graft.operators.Bm25.searchAllTopK(T(s, dir, "documents"),
      "text", "doc_id", rrfTermQueries, k = rrfLegK,
      k1 = rrfBm25K1, b = rrfBm25B)
    val emb = T(s, dir, "embeddings")
    val sem = Similarity.bruteForceTopK(emb,
        emb.where(col("vec_id") < rrfTermQueries.size),
        "embedding", "vec_id", k = rrfLegK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
    graft.operators.Hybrid.rrf(Seq(lex, sem), k0 = rrfK0, k = rrfK)
  }

  private def hybridRrfSql: String = {
    val qtRows = rrfTermQueries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '$t')")
    }.mkString(", ")
    val allTerms = rrfTermQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    // the BM25 contribution mirrors Bm25.searchAllTopK's expression
    // SHAPE exactly (same literals, same op order) — the same discipline
    // text_bm25's oracle follows
    val contrib =
      s"""CAST(floor(1000000.0
         |      * ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |          / (CAST(df AS DOUBLE) + 0.5))
         |      * (CAST(tf AS DOUBLE) * ${rrfBm25K1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + $rrfBm25K1 * (${1.0 - rrfBm25B}
         |          + $rrfBm25B * CAST(dl AS DOUBLE)
         |            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
         |      AS BIGINT)""".stripMargin
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
       |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       |qt AS (SELECT CAST(c0 AS BIGINT) AS query_id, c1 AS w
       |  FROM (VALUES $qtRows) t(c0, c1)),
       |post AS (SELECT d.doc_id, d.dl, t.w, CAST(count(*) AS BIGINT) AS tf
       |  FROM d, unnest(d.ws) AS t(w)
       |  WHERE t.w IN ($allTerms)
       |  GROUP BY 1, 2, 3),
       |docfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
       |  FROM post GROUP BY 1),
       |lexscore AS (SELECT qt.query_id, post.doc_id,
       |    CAST(sum($contrib) AS BIGINT) AS score
       |  FROM post JOIN docfreq USING (w) JOIN qt USING (w)
       |  CROSS JOIN corpus
       |  GROUP BY 1, 2),
       |lex AS (SELECT query_id, doc_id, rk FROM (
       |    SELECT query_id, doc_id, CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM lexscore)
       |  WHERE rk <= $rrfLegK),
       |n AS ($NORMED),
       |sem AS (SELECT query_id, doc_id, rk FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |      CAST(rank() OVER (PARTITION BY q.vec_id
       |        ORDER BY $COS DESC, c.vec_id) AS BIGINT) AS rk
       |    FROM n q JOIN n c
       |      ON q.vec_id < ${rrfTermQueries.size} AND c.vec_id <> q.vec_id)
       |  WHERE rk <= $rrfLegK),
       |legs AS (SELECT query_id, doc_id, 1000000 // ($rrfK0 + rk) AS c FROM lex
       |  UNION ALL
       |  SELECT query_id, doc_id, 1000000 // ($rrfK0 + rk) FROM sem),
       |fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro
       |  FROM legs GROUP BY 1, 2)
       |SELECT query_id, doc_id, rrf_micro, rk FROM (
       |  SELECT query_id, doc_id, rrf_micro,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rk FROM fused)
       |WHERE rk <= $rrfK""".stripMargin
  }

  /** The PRODUCTION hybrid: same fusion, but the semantic leg runs
   *  through the residual-IVFPQ tier (probed cells + 16-byte codes —
   *  what a 100 TB corpus actually scans) instead of brute force.
   *  Trained-model internals keep it bench-only; `pipeline_hybrid_rrf`
   *  above is the hash-certified composition and the recall ceiling,
   *  and the probed tier's own math is certified by
   *  `sim_rpq_adc_verify`. Same nprobe=32/256 operating point as
   *  `sim_rpq_topk` (keeps 0.672 of the exhaustive tier's 0.692
   *  recall@5). */
  private def hybridRrfAnnQ(s: SparkSession, dir: String): DataFrame = {
    val lex = graft.operators.Bm25.searchAllTopK(T(s, dir, "documents"),
      "text", "doc_id", rrfTermQueries, k = rrfLegK,
      k1 = rrfBm25K1, b = rrfBm25B)
    val emb = T(s, dir, "embeddings")
    val sem = graft.operators.Pq.residualIvfTopK(emb,
        emb.where(col("vec_id") < rrfTermQueries.size), "embedding", "vec_id",
        rpqCentroids(s, dir), rpqCodebooks(s, dir),
        k = rrfLegK, nprobe = 32)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
    graft.operators.Hybrid.rrf(Seq(lex, sem), k0 = rrfK0, k = rrfK)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_hybrid_rrf" -> (hybridRrfQ _),
    "sim_label_confusion" -> (labelConfusionQ _),
    "sim_negatives" -> (negativesQ _),
    "sim_cluster_balance" -> (clusterBalanceQ _),
    "sim_topk_brute"  -> (topkBrute _),
    "sim_mrl_recall"  -> (mrlRecall _),
    "sim_binary_topk" -> (binaryTopk _),
    "sim_drift"       -> (driftQ _),
    "sim_centroid_sep" -> (centroidSepQ _),
    "sim_separation"  -> (separationQ _),
    "sim_threshold"   -> (thresholdNbrs _),
    "sim_ivf_topk"    -> (ivfTopk _),
    "sim_quantize_int8" -> (quantizeInt8 _),
    "sim_random_proj" -> (randomProjQ _),
    "sim_pq_adc_verify" -> (pqAdcVerify _),
    "sim_ivfpq_verify" -> (ivfPqVerify _),
    "sim_rpq_adc_verify" -> (rpqAdcVerify _),
    "pipeline_ann_dedup" -> (annDedupQ _),
    "sim_srp_verify"  -> (srpVerify _),
    "sim_kmeans_verify" -> (kmeansVerify _)
  )

  /** Production ANN bench shapes (train + index + probe in one query)
   *  whose math is hash-certified by the `*_verify` rows above over
   *  materialized centroids/codes/buckets; trained-model internals make
   *  the raw shapes oracle-inexpressible, so the verify row is the
   *  correctness entry and these stay benchmark-only. */
  override val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_hybrid_ann" -> (hybridRrfAnnQ _),
    "sim_ivf_kmeans" -> (kmeansIvf _),
    "sim_ann_srp"    -> (srpAnn _),
    "sim_pq_topk"    -> (pqTopk _),
    "sim_ivfpq_topk" -> (ivfPqTopk _),
    "sim_rpq_topk"   -> (rpqTopk _)
  )

  override val oracles: Map[String, String] = Map(
    "pipeline_hybrid_rrf" -> hybridRrfSql,
    "sim_label_confusion" -> labelConfusionSql,
    "sim_negatives" -> negativesSql,
    "sim_cluster_balance" -> clusterBalanceSql,
    "sim_topk_brute" -> topkBruteSql,
    "sim_mrl_recall" -> mrlRecallSql,
    "sim_binary_topk" -> binaryTopkSql,
    "sim_drift"      -> driftSql,
    "sim_centroid_sep" -> centroidSepSql,
    "sim_separation" -> separationSql,
    "sim_threshold"  -> thresholdNbrsSql,
    "sim_ivf_topk"   -> ivfTopkSql,
    "sim_quantize_int8" -> quantizeInt8Sql,
    "sim_random_proj" -> randomProjSql,
    "sim_pq_adc_verify" -> pqAdcVerifySql,
    "sim_ivfpq_verify"  -> ivfPqVerifySql,
    "sim_rpq_adc_verify" -> rpqAdcVerifySql,
    "pipeline_ann_dedup" -> annDedupSql,
    "sim_srp_verify"    -> srpVerifySql,
    "sim_kmeans_verify" -> kmeansVerifySql
    // sim_ann_srp: approximate (LSH) — rows-only; recall bound covered in
    // SimilaritySpec against the brute-force baseline. sim_srp_verify
    // hash-certifies the bucket-join + cosine verify over materialized
    // buckets.
    // sim_ivf_kmeans: cluster ids come from the trained quantizer
    // (engine-internal) — rows-only; SimilaritySpec pins recall/
    // determinism, and sim_kmeans_verify hash-certifies the argmin
    // assignment + probing + ranking math over materialized centroids.
    // sim_pq_topk / sim_ivfpq_topk: trained-model internals — rows-only;
    // sim_pq_adc_verify hash-certifies the ADC math over materialized
    // codes + codebooks.
  )
}
