package graft.queries

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deduplication operator queries over the `documents` / `embeddings`
 * tables (SURVEY.md §2.6). Oracles compute ground truth the slow way
 * (all-pairs in SQL); the Spark side must reach the same answer through
 * its scalable path (hash grouping / LSH candidates / blocking).
 */
object DedupQueries extends QueryProvider {

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(T(s, dir, "documents"), "text", "doc_id")

  private val dedupExactSql =
    """SELECT min(doc_id) AS keeper_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text""".stripMargin

  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(T(s, dir, "documents"), "text", "doc_id", threshold = 0.8)

  // Ground truth: exact word-3-gram Jaccard over all pairs. The LSH path
  // must find every pair ≥ 0.8 (recall ≈ 1-5e-8 at the threshold).
  private val dedupMinhashSql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      |  FROM w WHERE len(ws) >= 3
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE 1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) >= 0.8""".stripMargin

  // Decontamination split: sources src0-src4 act as the "reference"
  // (eval/benchmark stand-in), the rest as the training corpus.
  private[queries] val RefSources = Seq("src0", "src1", "src2", "src3", "src4")

  private def dedupCrossMinhash(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    Dedup.minHashLshAgainst(
      corpus = docs.where(!col("source").isInCollection(RefSources)),
      ref = docs.where(col("source").isInCollection(RefSources)),
      "text", "doc_id", threshold = 0.8)
  }

  // Ground truth: exact word-3-gram Jaccard across the bipartite split.
  private val dedupCrossMinhashSql =
    """WITH w AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      |  FROM w WHERE len(ws) >= 3
      |)
      |SELECT a.doc_id AS doc_id, b.doc_id AS ref_doc,
      |  1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) AS jaccard
      |FROM sh a JOIN sh b
      |  ON a.source NOT IN ('src0','src1','src2','src3','src4')
      | AND b.source IN ('src0','src1','src2','src3','src4')
      |WHERE 1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) >= 0.8""".stripMargin

  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(T(s, dir, "documents"), "text", "doc_id", maxHamming = 3)

  // Cross-engine certification of the simhash candidate/verify math. The
  // 64-bit signatures are engine-internal (native token-hash loop), so
  // dedup_simhash itself stays rows-only — but GIVEN the signatures the
  // rest is exact integer math. Spark materializes its signature table as
  // an ingest-time artifact (Scratch.materialize), re-searches it through
  // the pigeonhole blocking, and the oracle brute-forces all-pairs
  // hamming over the SAME parquet — certifying blocking recall (the
  // blocked path must find every pair brute force finds) and the bit
  // arithmetic, as dedup_ref_exact does for the bloom path.
  private def dedupSimhashVerify(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.materialize(s, dir, "simhash_sigs",
      Dedup.simHashSignatures(T(s, dir, "documents"), "text", "doc_id"))
    Dedup.simHashFromSignatures(s.read.parquet(path), maxHamming = 3)
  }

  private val dedupSimhashVerifySql =
    s"""WITH s AS (SELECT doc, simhash
       |  FROM read_parquet('${Scratch.oraclePath("simhash_sigs")}/*.parquet'))
       |SELECT a.doc AS doc_a, b.doc AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.doc < b.doc
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  // Cross-corpus signature search, hash-certified like dedup_simhash_verify:
  // both sides' signatures are materialized (engine-internal token-hash
  // loop), then Spark re-searches corpus-vs-reference through the chunk
  // pigeonhole while DuckDB brute-forces the full bipartite hamming over
  // the SAME parquet — certifying blocking recall (the blocked path must
  // find every cross pair brute force finds) and the bit arithmetic.
  private def dedupCrossSimhashVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val isRef = col("source").isin("src0", "src1", "src2", "src3", "src4")
    val path = Scratch.materialize(s, dir, "cross_simhash_sigs",
      Dedup.simHashSignatures(docs.where(!isRef), "text", "doc_id")
        .withColumn("side", lit("corpus"))
        .unionAll(Dedup.simHashSignatures(docs.where(isRef), "text", "doc_id")
          .withColumn("side", lit("ref"))))
    val all = s.read.parquet(path)
    Dedup.simHashAgainst(
      all.where(col("side") === "corpus").select("doc", "simhash"),
      all.where(col("side") === "ref").select("doc", "simhash"),
      maxHamming = 3)
  }

  private val dedupCrossSimhashVerifySql =
    s"""WITH s AS (SELECT doc, simhash, side
       |  FROM read_parquet('${Scratch.oraclePath("cross_simhash_sigs")}/*.parquet'))
       |SELECT a.doc AS doc, b.doc AS ref_doc,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.side = 'corpus' AND b.side = 'ref'
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  private def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(T(s, dir, "documents"), "text", "doc_id",
      blockCol = "lang", threshold = 0.7, n = 3)

  private val dedupNgramSql =
    """WITH g AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, length(text) - 1),
      |      i -> substring(text, i, 3))) AS t
      |  FROM documents WHERE length(text) >= 3
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  1.0 * len(list_intersect(a.t, b.t)) / len(list_distinct(a.t || b.t)) AS jaccard
      |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE 1.0 * len(list_intersect(a.t, b.t)) / len(list_distinct(a.t || b.t)) >= 0.7""".stripMargin

  // Directed containment pairs (Dedup.ngramContainment): the asymmetric
  // near-dup relation — truncations/quotes/wrapped copies — in integer
  // basis points, the oracle replaying intersect counts on real trigram
  // lists.
  private def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainment(T(s, dir, "documents"), "text", "doc_id",
      blockCol = "lang", tBp = 9000L, n = 3)

  private val dedupContainmentSql =
    """WITH g AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, length(text) - 1),
      |      i -> substring(text, i, 3))) AS t
      |  FROM documents WHERE length(text) >= 3
      |),
      |p AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter,
      |    CAST(len(a.t) AS BIGINT) AS na, CAST(len(b.t) AS BIGINT) AS nb
      |  FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |),
      |d AS (
      |  SELECT da AS doc_sub, db AS doc_super, inter, na AS n_sub,
      |    CAST(inter * 10000 // na AS BIGINT) AS cont_bp FROM p
      |  UNION ALL
      |  SELECT db AS doc_sub, da AS doc_super, inter, nb AS n_sub,
      |    CAST(inter * 10000 // nb AS BIGINT) AS cont_bp FROM p
      |)
      |SELECT doc_sub, doc_super, inter, n_sub, cont_bp
      |FROM d WHERE cont_bp >= 9000""".stripMargin

  private def dedupAllPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.allPairsJaccard(T(s, dir, "documents"), "text", "doc_id",
      threshold = 0.7, n = 3)

  // Ground truth: UNBLOCKED exact all-pairs word-3-shingle Jaccard. The
  // Spark side must reach the same pair set through the AllPairs prefix
  // index (recall is exactly 1 by the prefix-filter theorem).
  private val dedupAllPairsSql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      |  FROM w WHERE len(ws) >= 3
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE 1.0 * len(list_intersect(a.s, b.s)) / len(list_distinct(a.s || b.s)) >= 0.7""".stripMargin

  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosine(T(s, dir, "embeddings"), "embedding", "vec_id",
      blockCol = "label", threshold = 0.402)

  // Threshold 0.402 sits in a ≥3e-4 gap of the pair-similarity
  // distribution at sf0.01 and sf0.1 — far above any cross-engine float
  // noise (~1e-7). Ids only: similarity values never leave the engines.
  private val dedupEmbeddingSql =
    """WITH n AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, 65),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / (a.nrm * b.nrm) >= 0.402""".stripMargin

  // Embedding-level decontamination: corpus vectors (19/20 of the table)
  // probed against a small held-out reference slice (vec_id % 20 = 0 — the
  // "eval benchmark"). The reference broadcasts; the corpus never
  // shuffles. Threshold 0.4157 sits in a ≥1.9e-3 gap of the cross-pair
  // cosine distribution at sf0.01 AND sf0.1 — far above cross-engine
  // float noise (~1e-7).
  private def dedupEmbedContam(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Dedup.embeddingAgainst(
      emb.where(col("vec_id") % 20 =!= 0),
      emb.where(col("vec_id") % 20 === 0),
      "embedding", "vec_id", threshold = 0.4157)
  }

  private val dedupEmbedContamSql =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |)
      |SELECT c.vec_id AS vec_id, r.vec_id AS ref_id
      |FROM n c JOIN n r ON c.vec_id % 20 != 0 AND r.vec_id % 20 = 0
      |WHERE list_sum(list_transform(range(1, 65),
      |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(r.embedding[i] AS DOUBLE)))
      |      / (c.nrm * r.nrm) >= 0.4157""".stripMargin

  // SemDeDup: k-means cells from the corpus's own embeddings, within-cell
  // cosine pairs, keep-one survivors. Cell boundaries come from the
  // trained quantizer (engine-internal, like sim_ivf_kmeans) — rows-only
  // here; SemDedupSpec pins k=1 ground-truth equivalence, determinism,
  // and the partition property. The quantizer is memoized per (session,
  // dir) as ingest-time work — trained once, reused across bench reruns —
  // mirroring how a 100 TB run shares one trained quantizer between the
  // dedup pass and the IVF index.
  private val semCentroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  private def semCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    semCentroidCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir:k=8:iters=3",
      _ => graft.operators.Kmeans.train(T(s, dir, "embeddings"),
        "embedding", "vec_id", k = 8, iters = 3))

  private def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    graft.operators.SemDedup.semantic(T(s, dir, "embeddings"),
      "embedding", "vec_id", semCentroids(s, dir), threshold = 0.402,
      saltBuckets = 8)
      .select(col("vec_id"), col("label"))

  // Cross-engine certification of the WHOLE SemDeDup chain — the
  // companion that closes dedup_semantic's rows-only gap. The centroid
  // values are trained-model internals (that query stays rows-only), but
  // GIVEN the materialized centroid table every downstream stage is
  // exactly replayable: DuckDB recomputes each row's squared-L2 argmin
  // cell (certifying the NearestCentroid blocking), the within-cell
  // cosine-threshold pair set (certifying that salted-triangle blocking
  // loses nothing — the salt decomposition must be invisible in the
  // result), the transitive closure over those pairs (recursive CTE, the
  // same oracle shape dedup_clusters uses), and the min-id survivor set.
  // One hash match certifies blocking + verify + CC + keep-one end to end.
  private def dedupSemanticVerify(s: SparkSession, dir: String): DataFrame = {
    val cents = semCentroids(s, dir)
    Scratch.materialize(s, dir, "semdedup_centroids",
      graft.operators.Kmeans.centroidsDf(s, cents))
    graft.operators.SemDedup.semantic(T(s, dir, "embeddings"),
      "embedding", "vec_id", cents, threshold = 0.402, saltBuckets = 8)
      .select(col("vec_id"), col("label"))
  }

  private val dedupSemanticVerifySql =
    s"""WITH RECURSIVE ct AS (SELECT cell, vals
       |  FROM read_parquet('${Scratch.oraclePath("semdedup_centroids")}/*.parquet')),
       |n AS (
       |  SELECT vec_id, label, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
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
       |pairs AS (
       |  SELECT a.vec_id AS u, b.vec_id AS v
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN n x ON x.vec_id = a.vec_id
       |  JOIN n y ON y.vec_id = b.vec_id
       |  WHERE list_sum(list_transform(range(1, 65),
       |          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
       |        / (x.nrm * y.nrm) >= 0.402),
       |e AS (
       |  SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
       |reach(node, r) AS (
       |  SELECT u, u FROM e
       |  UNION
       |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node),
       |cc AS (
       |  SELECT node, min(r) AS cluster FROM reach GROUP BY node)
       |SELECT vec_id, label FROM embeddings
       |WHERE vec_id NOT IN (SELECT node FROM cc WHERE node <> cluster)""".stripMargin

  /**
   * Pair graph for cluster resolution: near-dup pairs (blocked char-3-gram
   * Jaccard ≥ 0.7 — the oracle-proven pair set) unioned with exact-dup
   * pairs. The exact side emits STAR pairs (keeper → copy) from a hash
   * groupBy, not the within-group all-pairs quadratic — different edge
   * set, identical components, which is all `connectedComponents` needs.
   */
  private def dupPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val near = Dedup.ngramJaccard(docs, "text", "doc_id",
      blockCol = "lang", threshold = 0.7, n = 3)
      .select(col("doc_a"), col("doc_b"))
    val hashed = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val keepers = hashed.groupBy("h").agg(min(col("doc_id")).as("k"))
    val exact = hashed.join(keepers, "h")
      .where(col("doc_id") =!= col("k"))
      .select(col("k").as("doc_a"), col("doc_id").as("doc_b"))
    near.union(exact)
  }

  // Incremental cluster maintenance (Clusters.addEdges), certified
  // against the FULL recompute: the "ingested" half (even doc_ids) is
  // clustered normally, then the pairs touching the "new batch" (odd
  // doc_ids) fold in incrementally — only affected clusters re-cluster,
  // the rest pass through with no CC stage. Pair-measure subset
  // consistency + same-text star/clique equivalence make the union of
  // the two mined pair sets component-equal to mining everything at
  // once, so the oracle is exactly the dedup_clusters closure: the hash
  // match proves incremental ≡ full.
  private def dedupClusterUpdate(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val evens = docs.where(col("doc_id") % 2 === 0)
    val near = Dedup.ngramJaccard(evens, "text", "doc_id",
      blockCol = "lang", threshold = 0.7, n = 3)
      .select(col("doc_a"), col("doc_b"))
    val hashedE = evens.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val keepersE = hashedE.groupBy("h").agg(min(col("doc_id")).as("k"))
    val exactE = hashedE.join(keepersE, "h")
      .where(col("doc_id") =!= col("k"))
      .select(col("k").as("doc_a"), col("doc_id").as("doc_b"))
    // Checkpointed to mirror production, where the map is read back from
    // the materialized cluster table: addEdges references it three times
    // (affected set, untouched pass-through, touched stars) and must not
    // re-run the ingest clustering per reference.
    val map = graft.operators.Clusters.connectedComponents(
      near.union(exactE), "doc_a", "doc_b").localCheckpoint()
    val batchTouching = dupPairs(s, dir)
      .where(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
    graft.operators.Clusters.addEdges(map, batchTouching, "doc_a", "doc_b")
      .select(col("node").cast("long").as("doc_id"),
        col("cluster").cast("long").as("cluster_id"))
  }

  // Oracle-side closure over the SAME pair graph: transitive reachability
  // via recursive CTE (fine at oracle scale — closure size is Σ component²
  // and dup components are small), cluster = min reachable node. The Spark
  // side must reach identical assignments through log-round star rounds.
  private val ccOracleCte =
    """WITH RECURSIVE g AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, length(text) - 1),
      |      i -> substring(text, i, 3))) AS t
      |  FROM documents WHERE length(text) >= 3
      |), near AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE 1.0 * len(list_intersect(a.t, b.t)) / len(list_distinct(a.t || b.t)) >= 0.7
      |), ex AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
      |), e AS (
      |  SELECT u, v FROM near UNION SELECT u, v FROM ex
      |  UNION SELECT v AS u, u AS v FROM near UNION SELECT v AS u, u AS v FROM ex
      |), reach(node, r) AS (
      |  SELECT u, u FROM e
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
      |), cc AS (
      |  SELECT node, min(r) AS cluster FROM reach GROUP BY node
      |)""".stripMargin

  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clusters.connectedComponents(dupPairs(s, dir), "doc_a", "doc_b")
      .select(col("node").cast("long").as("doc_id"),
        col("cluster").cast("long").as("cluster_id"))

  private val dedupClustersSql = ccOracleCte +
    """
      |SELECT CAST(node AS BIGINT) AS doc_id, CAST(cluster AS BIGINT) AS cluster_id
      |FROM cc""".stripMargin

  // End-to-end corpus dedup: resolve clusters, keep the canonical member,
  // count survivors per language — the composition a training pipeline
  // actually runs (pairs → components → filtered corpus).
  private def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val clusters = graft.operators.Clusters
      .connectedComponents(dupPairs(s, dir), "doc_a", "doc_b")
    graft.operators.Clusters.survivors(docs, "doc_id", clusters)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
  }

  private val dedupSurvivorsSql = ccOracleCte +
    """
      |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
      |FROM documents d
      |WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster)
      |GROUP BY d.lang""".stripMargin

  /**
   * One-time cluster-map materialization per (session, sf dir) — the CC
   * run is ingest-time work (cluster once, filter many), so the consumer
   * query below measures only the map-join. Memo key recorded only after
   * a successful build, mirroring StorageQueries.ensureBucketedTables.
   */
  private val clusterMapBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensureClusterMap(s: SparkSession, dir: String): Unit =
    clusterMapBuilt.synchronized {
      val path = Scratch.dir(dir, "cluster_map")
      val key = s"${s.sparkContext.applicationId}:$path"
      if (clusterMapBuilt.contains(key)) return
      graft.operators.Clusters.materialize(s, dupPairs(s, dir),
        "doc_a", "doc_b", table = "g_cluster_map", path = path)
      clusterMapBuilt.add(key)
    }

  // Same composition as dedup_survivors, but consuming the MATERIALIZED
  // cluster map: zero CC stages in this query's plan (asserted in
  // ClustersSpec) — the assignment is a bucketed FileScan. Oracle is the
  // identical closure SQL, so the map is proven equal to the inline run.
  private def dedupSurvivorsFromMap(s: SparkSession, dir: String): DataFrame = {
    ensureClusterMap(s, dir)
    graft.operators.Clusters
      .survivors(T(s, dir, "documents"), "doc_id", s.table("g_cluster_map"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
  }

  // Keep-BEST survivors: per duplicate cluster keep the longest copy
  // (ties to the lower id) — the policy real pipelines run instead of
  // keep-min-id. Rides the materialized map (zero CC stages); oracle is
  // the same closure with the argmax in SQL.
  private def dedupSurvivorsBest(s: SparkSession, dir: String): DataFrame = {
    ensureClusterMap(s, dir)
    graft.operators.Clusters
      .survivorsBy(T(s, dir, "documents"), "doc_id", s.table("g_cluster_map"),
        length(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
  }

  private val dedupSurvivorsBestSql = ccOracleCte +
    """,
      |a AS (
      |  SELECT d.doc_id, d.lang, d.text, coalesce(cc.cluster, d.doc_id) AS grp
      |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
      |), r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY grp
      |      ORDER BY length(text) DESC, doc_id) AS rn
      |  FROM a
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
      |FROM r WHERE rn = 1 GROUP BY lang""".stripMargin

  // Duplicate-cluster size histogram — the dedup-diagnostics report
  // (how much of the corpus sits in 2-copy vs 50-copy families). Rides
  // the MATERIALIZED cluster map like dedup_survivors_from_map: zero CC
  // stages here, two tiny aggregations over (node, cluster).
  private def dedupClusterSizes(s: SparkSession, dir: String): DataFrame = {
    ensureClusterMap(s, dir)
    s.table("g_cluster_map")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).cast("long").as("n_clusters"))
      .select(col("n").cast("long").as("cluster_size"), col("n_clusters"))
  }

  private val dedupClusterSizesSql = ccOracleCte +
    """,
      |szs AS (SELECT cluster, count(*) AS n FROM cc GROUP BY cluster)
      |SELECT CAST(n AS BIGINT) AS cluster_size,
      |  CAST(count(*) AS BIGINT) AS n_clusters
      |FROM szs GROUP BY n""".stripMargin

  // Segment ("line") dedup: 10-token segments, drop any appearing in >1
  // distinct docs. Spark keys segments by xxhash64, the oracle by segment
  // text — equal up to a ~n²/2⁶⁵ collision (same trade as dedup_exact).
  private def dedupSegments(s: SparkSession, dir: String): DataFrame =
    Dedup.segmentDedup(T(s, dir, "documents"), "text", "doc_id",
      segTokens = 10, maxDocFreq = 1)

  private val dedupSegmentsSql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, ws, n, unnest(range(0, (n - 1) // 10 + 1)) AS seg_id
      |  FROM w
      |), s AS (
      |  SELECT doc_id, seg_id,
      |    array_to_string(ws[seg_id * 10 + 1 : seg_id * 10 + 10], ' ') AS seg
      |  FROM c
      |), f AS (
      |  SELECT seg, count(DISTINCT doc_id) AS doc_freq FROM s GROUP BY seg
      |), kept AS (
      |  SELECT s.doc_id, s.seg_id, s.seg
      |  FROM s JOIN f USING (seg) WHERE f.doc_freq <= 1
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_segments,
      |  string_agg(seg, ' ' ORDER BY seg_id) AS text_dedup
      |FROM kept GROUP BY doc_id""".stripMargin

  // Intra-document repeated-line removal (TextAnalysis.dedupLines — the
  // RefinedWeb within-page rule, vs segment dedup's cross-page rule). The
  // corpus is re-lined deterministically at 2 words/line on both engines
  // (narrow enough that real intra-doc repeats exist in the synthetic
  // text); the oracle keeps each line's first occurrence by min position.
  private def dedupLinesIntra(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val relined = T(s, dir, "documents").select(col("doc_id"),
      array_join(transform(
        sequence(lit(0), ((size(ws) - lit(1)) / lit(2)).cast("int")),
        i => array_join(slice(ws, i * lit(2) + lit(1), lit(2)), " ")), "\n")
        .as("text"))
    graft.operators.TextAnalysis.dedupLines(relined, "text", "doc_id")
  }

  private val dedupLinesIntraSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |rl AS (SELECT doc_id,
      |  list_transform(generate_series(0, CAST((len(ws) - 1) // 2 AS INT)),
      |    i -> array_to_string(ws[(i*2+1):(i*2+2)], ' ')) AS ls
      |  FROM w),
      |ix AS (SELECT doc_id, unnest(range(0, len(ls))) AS idx,
      |  unnest(ls) AS line FROM rl),
      |fk AS (SELECT doc_id, line, min(idx) AS mi
      |  FROM ix GROUP BY doc_id, line),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |  string_agg(line, chr(10) ORDER BY mi) AS clean_text
      |  FROM fk GROUP BY doc_id),
      |nl AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines FROM rl)
      |SELECT doc_id, n_lines, n_kept, clean_text
      |FROM nl JOIN agg USING (doc_id)""".stripMargin

  // Incremental snapshot ingest (Dedup.incrementalNew): sources src0-src4
  // are the already-ingested corpus, the rest the new dump; survivors are
  // content-new AND first-id-unique within the dump. The registered query
  // exercises the Bloom-prefiltered scale path; DedupSpec pins it equal
  // to the plain anti-join. Spark keys by xxhash64, the oracle by text.
  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    Dedup.incrementalNew(
      batch = docs.where(!col("source").isInCollection(RefSources)),
      corpus = docs.where(col("source").isInCollection(RefSources)),
      "text", "doc_id", bloomExpectedItems = 4096)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  private val dedupIncrementalSql =
    s"""WITH newb AS (SELECT * FROM documents
      |  WHERE source NOT IN (${RefSources.map("'" + _ + "'").mkString(", ")})),
      |oldc AS (SELECT DISTINCT text FROM documents
      |  WHERE source IN (${RefSources.map("'" + _ + "'").mkString(", ")})),
      |fresh AS (SELECT n.* FROM newb n LEFT JOIN oldc o ON n.text = o.text
      |  WHERE o.text IS NULL),
      |keep AS (SELECT text, min(doc_id) AS doc_id FROM fresh GROUP BY text)
      |SELECT f.doc_id, f.source, f.n_chars
      |FROM fresh f JOIN keep k ON f.text = k.text AND f.doc_id = k.doc_id""".stripMargin

  // Snapshot diff (Dedup.snapshotDiff): two crawl snapshots carved
  // deterministically from documents — ids ending in 3 joined late
  // (added), ids ending in 6 dropped from the refresh (removed), every
  // id divisible by 7 re-crawled with edited content (changed). The
  // oracle rebuilds both snapshots and the full-outer classification
  // from raw text.
  private def dedupSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val oldSnap = docs.where(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text")).as("text"))
    val newSnap = docs.where(col("doc_id") % 10 =!= 6)
      .select(col("doc_id"), col("text"))
    Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
  }

  private val dedupSnapshotDiffSql =
    """WITH olds AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' [v1]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 3),
      |news AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 6)
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.text = n.text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id""".stripMargin

  // ExactSubstr-style duplicated token runs (Spans.duplicateSpans):
  // Spark detects duplicates by positioned xxhash64 8-grams, the oracle by
  // literal gram strings — identical spans up to a ~positions²/2⁶⁵
  // collision. The gaps-and-islands merge is exact integer arithmetic on
  // both sides.
  private def dedupSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.duplicateSpans(T(s, dir, "documents"),
      "text", "doc_id", n = 8, minOccurrences = 2)

  /** Shared spans chain over any (doc_id, text) source — `w … spans`
   *  CTEs of the ExactSubstr oracle; `pipeline_clean_corpus` composes the
   *  SAME string over normalized text, so a future fix here propagates to
   *  every consumer instead of drifting in a copy. */
  private[queries] def spansChainSql(src: String): String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
      |g AS (
      |  SELECT doc_id, unnest(range(len(ws) - 7)) AS pos, ws
      |  FROM w WHERE len(ws) >= 8
      |), gs AS (
      |  SELECT doc_id, pos,
      |    ws[pos+1] || ' ' || ws[pos+2] || ' ' || ws[pos+3] || ' ' || ws[pos+4]
      |    || ' ' || ws[pos+5] || ' ' || ws[pos+6] || ' ' || ws[pos+7] || ' '
      |    || ws[pos+8] AS gram
      |  FROM g
      |), dup AS (
      |  SELECT gram FROM gs GROUP BY gram HAVING count(*) >= 2
      |), cov AS (
      |  SELECT doc_id, pos FROM gs JOIN dup USING (gram)
      |), brk AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |         OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
      |      THEN 1 ELSE 0 END AS b
      |  FROM cov
      |), isl AS (
      |  SELECT doc_id, pos,
      |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM brk
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, island
      |)""".stripMargin

  /** Strip consumer over the spans chain: rebuilt text per doc, fully-
   *  covered docs restored as '' from `src` (same contract as
   *  `Spans.stripSpans`). */
  private[queries] def stripChainSql(src: String): String =
    s""",
      |covpos AS (SELECT doc_id, unnest(range(s, e + 1)) AS p FROM spans),
      |toks AS (SELECT doc_id, unnest(range(len(ws))) AS p, ws FROM w),
      |tok2 AS (SELECT doc_id, p, ws[p+1] AS tok FROM toks),
      |kept AS (
      |  SELECT t.doc_id, t.p, t.tok
      |  FROM tok2 t LEFT JOIN covpos c ON t.doc_id = c.doc_id AND t.p = c.p
      |  WHERE c.doc_id IS NULL
      |), agg AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
      |  FROM kept GROUP BY doc_id
      |), cleaned AS (
      |  SELECT d.doc_id, coalesce(a.text, '') AS text
      |  FROM $src d LEFT JOIN agg a USING (doc_id)
      |)""".stripMargin

  /** Bipartite spans chain: corpus positions covered iff their gram
   *  appears ANYWHERE in the reference side (≥ 1) — the decontamination
   *  form of `spansChainSql`; CTE names line up so `stripChainSql`
   *  composes unchanged. */
  private[queries] def contamSpansChainSql(
      corpusSrc: String, refSrc: String): String = {
    // Single line: a multi-line fragment would be re-mangled by the
    // OUTER stripMargin (leading "||" reads as a margin pipe + "|").
    val gram = (v: String) =>
      (1 to 8).map(i => s"$v[pos+$i]").mkString(" || ' ' || ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $corpusSrc),
      |g AS (
      |  SELECT doc_id, unnest(range(len(ws) - 7)) AS pos, ws
      |  FROM w WHERE len(ws) >= 8
      |), gs AS (
      |  SELECT doc_id, pos, ${gram("ws")} AS gram
      |  FROM g
      |), rw AS (SELECT string_split(text, ' ') AS ws FROM $refSrc),
      |rg AS (
      |  SELECT unnest(range(len(ws) - 7)) AS pos, ws
      |  FROM rw WHERE len(ws) >= 8
      |), dup AS (
      |  SELECT DISTINCT ${gram("ws")} AS gram FROM rg
      |), cov AS (
      |  SELECT doc_id, pos FROM gs JOIN dup USING (gram)
      |), brk AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |         OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
      |      THEN 1 ELSE 0 END AS b
      |  FROM cov
      |), isl AS (
      |  SELECT doc_id, pos,
      |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM brk
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, island
      |)""".stripMargin
  }

  private val spansCte = "WITH " + spansChainSql("documents")

  private val dedupSpansSql = spansCte +
    """
      |SELECT doc_id, CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end
      |FROM spans""".stripMargin

  // Consumer of the spans: strip every duplicated run, keep the rest of
  // the document verbatim (fully-covered docs come back as '').
  private def dedupStripSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.stripSpans(T(s, dir, "documents"),
      "text", "doc_id", n = 8, minOccurrences = 2)

  private val dedupStripSpansSql = spansCte + stripChainSql("documents") +
    "\nSELECT doc_id, text FROM cleaned"

  // Substring-level decontamination: spans of training docs quoting any
  // reference (eval-set stand-in) 8-gram, and the corpus with those runs
  // stripped — the span-level complement of dedup_cross_minhash (same
  // src0-4 reference split). Positions/intervals are exact integers on
  // both sides.
  private def contamCorpus(s: SparkSession, dir: String) =
    T(s, dir, "documents").where(!col("source").isInCollection(RefSources))
  private def contamRef(s: SparkSession, dir: String) =
    T(s, dir, "documents").where(col("source").isInCollection(RefSources))

  private def dedupContamSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.contaminatedSpans(
      contamCorpus(s, dir), contamRef(s, dir), "text", "doc_id", n = 8)

  private def dedupStripContam(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.stripContaminated(
      contamCorpus(s, dir), contamRef(s, dir), "text", "doc_id", n = 8)

  private[queries] val contamCorpusSql =
    "(SELECT * FROM documents WHERE source NOT IN " +
      "('src0','src1','src2','src3','src4'))"
  private[queries] val contamRefSql =
    "(SELECT * FROM documents WHERE source IN " +
      "('src0','src1','src2','src3','src4'))"

  private val contamCte = "WITH " + contamSpansChainSql(contamCorpusSql, contamRefSql)

  private val dedupContamSpansSql = contamCte +
    """
      |SELECT doc_id, CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end
      |FROM spans""".stripMargin

  private val dedupStripContamSql = contamCte + stripChainSql(contamCorpusSql) +
    "\nSELECT doc_id, text FROM cleaned"

  // Reference slice = every 10th doc (the "already trained on" corpus).
  // Bloom probe output is rows-only by design (the false-positive set is
  // sketch-internal); DedupSpec pins no-false-negatives + an FP ceiling
  // against the exact companion below.
  private def dedupBloomRef(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    Dedup.bloomReference(docs, docs.where(col("doc_id") % 10 === 0),
        "text", "doc_id", expectedItems = 100000, fpp = 0.01)
      .where(col("might_match"))
      .select(col("doc_id"))
  }

  // Exact companion (and ground truth for the bloom spec): membership by
  // content hash semi-join — the verify pass a pipeline runs on the
  // bloom-flagged slice.
  private def dedupRefExact(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val ref = docs.where(col("doc_id") % 10 === 0)
      .select(xxhash64(col("text")).as("h")).distinct()
    docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .join(ref, Seq("h"), "left_semi")
      .select(col("doc_id"))
  }

  private val dedupRefExactSql =
    """SELECT doc_id FROM documents
      |WHERE text IN (SELECT text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  // Cross-engine certification of the bloom-probe contract. The bitset is
  // engine-internal (so dedup_bloom_ref stays a bench shape), but GIVEN
  // the materialized per-row probe decisions the contract is exact
  // relational math: Spark and DuckDB each recompute exact reference
  // membership from raw text and join it against the SAME probe parquet —
  // the hash match certifies the exact-membership sets agree cross-engine
  // and that both engines see an identical false_negative column (all
  // false; DedupSpec pins the invariant, this row pins it cross-engine
  // over the exact bytes the bloom emitted).
  private def dedupBloomVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    val path = Scratch.materialize(s, dir, "bloom_probe",
      Dedup.bloomReference(docs, docs.where(col("doc_id") % 10 === 0),
        "text", "doc_id", expectedItems = 100000, fpp = 0.01))
    val ref = docs.where(col("doc_id") % 10 === 0)
      .select(xxhash64(col("text")).as("h")).distinct()
      .withColumn("__m", lit(true))
    val exact = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .join(ref, Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("__m"), lit(false)).as("exact_member"))
    s.read.parquet(path).join(exact, Seq("doc_id"))
      .select(col("doc_id"), col("might_match"), col("exact_member"),
        (col("exact_member") && !col("might_match")).as("false_negative"))
  }

  private val dedupBloomVerifySql =
    s"""WITH p AS (SELECT doc_id, might_match
       |  FROM read_parquet('${Scratch.oraclePath("bloom_probe")}/*.parquet')),
       |e AS (SELECT doc_id,
       |  text IN (SELECT text FROM documents WHERE doc_id % 10 = 0) AS exact_member
       |  FROM documents)
       |SELECT p.doc_id AS doc_id, p.might_match AS might_match,
       |  e.exact_member AS exact_member,
       |  (e.exact_member AND NOT p.might_match) AS false_negative
       |FROM p JOIN e ON p.doc_id = e.doc_id""".stripMargin

  // HLL sketch comparison is engine-specific — rows-only check by design.
  // The exact count groups 64-bit content hashes, not the documents: the
  // distinct-shuffle moves 8 bytes/row instead of the text (same count up
  // to a ~n²/2⁶⁵ collision; the scalable shape at 100 TB).
  private def approxDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .groupBy(col("source"))
      .agg(
        // when() keeps nulls OUT of the hash (xxhash64(null) = the seed,
        // which countDistinct would wrongly count as a value).
        countDistinct(when(col("text").isNotNull, xxhash64(col("text"))))
          .as("n_exact"),
        approx_count_distinct(
          when(col("text").isNotNull, xxhash64(col("text"))), 0.02)
          .as("n_approx"))

  // Cross-engine certification of the HLL error contract: the sketch
  // value is engine-internal (dedup_approx_distinct stays a bench shape),
  // but GIVEN the materialized per-source (n_exact, n_approx) pair DuckDB
  // recomputes the exact distinct count from raw text and re-derives the
  // same agreement/error-bound booleans — the hash match certifies the
  // exact counts agree cross-engine and the committed ±4% bound holds
  // over the exact sketch values Spark produced.
  private def dedupApproxVerify(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.materialize(s, dir, "approx_counts",
      approxDistinct(s, dir))
    val check = T(s, dir, "documents").groupBy(col("source"))
      .agg(countDistinct(when(col("text").isNotNull, xxhash64(col("text"))))
        .as("n_check"))
    s.read.parquet(path).join(check, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_approx"),
        (col("n_exact") === col("n_check")).as("exact_agrees"),
        (abs(col("n_approx") - col("n_check")) <= col("n_check") * 0.04)
          .as("within_bound"))
  }

  private val dedupApproxVerifySql =
    s"""WITH m AS (SELECT source, n_exact, n_approx
       |  FROM read_parquet('${Scratch.oraclePath("approx_counts")}/*.parquet')),
       |e AS (SELECT source, CAST(count(DISTINCT text) AS BIGINT) AS n_check
       |  FROM documents GROUP BY source)
       |SELECT m.source AS source, m.n_exact AS n_exact, m.n_approx AS n_approx,
       |  (m.n_exact = e.n_check) AS exact_agrees,
       |  (abs(m.n_approx - e.n_check) <= e.n_check * 0.04) AS within_bound
       |FROM m JOIN e ON m.source = e.source""".stripMargin

  /** Entity-resolution fuzzy pairs over customer names (ed <= 1):
   *  deletion-neighborhood blocking + levenshtein verify; the oracle
   *  BRUTE-FORCES all pairs, so the hash certifies the blocking loses
   *  nothing. 19500 pairs at sf0.01. */
  private def fuzzyKeyQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.fuzzyKeyPairs(
      T(s, dir, "customer"), "c_name", "c_custkey")

  private val fuzzyKeySql =
    """SELECT a.c_custkey AS a, b.c_custkey AS b
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  /** Entity resolution end-to-end: fuzzy key pairs (ed ≤ 1, deletion-
   *  neighborhood blocked) → connected components → canonical entity id
   *  per customer. The oracle brute-forces the pairs AND replays the
   *  transitive closure as a recursive CTE, so the hash certifies
   *  blocking completeness and the clustering together. */
  private def fuzzyClustersQ(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Dedup.fuzzyKeyPairs(
      T(s, dir, "customer"), "c_name", "c_custkey")
    graft.operators.Clusters.connectedComponents(pairs, "a", "b")
      .select(col("node").cast("long").as("c_custkey"),
        col("cluster").cast("long").as("entity_id"))
  }

  private val fuzzyClustersSql =
    """WITH RECURSIVE p AS MATERIALIZED (
      |  SELECT a.c_custkey AS u, b.c_custkey AS v
      |  FROM customer a JOIN customer b
      |    ON a.c_custkey < b.c_custkey
      |    AND levenshtein(a.c_name, b.c_name) <= 1
      |), e AS MATERIALIZED (
      |  SELECT u, v FROM p UNION SELECT v, u FROM p
      |), reach(node, r) AS (
      |  SELECT u, u FROM e
      |  UNION
      |  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
      |), cc AS (
      |  SELECT node, min(r) AS cluster FROM reach GROUP BY node
      |)
      |SELECT CAST(node AS BIGINT) AS c_custkey,
      |  CAST(cluster AS BIGINT) AS entity_id
      |FROM cc""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"          -> (dedupExact _),
    "dedup_fuzzy_key"      -> (fuzzyKeyQ _),
    "dedup_fuzzy_clusters" -> (fuzzyClustersQ _),
    "dedup_minhash_lsh"    -> (dedupMinhash _),
    "dedup_cross_minhash"  -> (dedupCrossMinhash _),
    "dedup_ngram_jaccard"  -> (dedupNgram _),
    "dedup_containment"    -> (dedupContainment _),
    "dedup_allpairs"       -> (dedupAllPairs _),
    "dedup_embedding"      -> (dedupEmbedding _),
    "dedup_embed_contam"   -> (dedupEmbedContam _),
    "dedup_approx_verify"  -> (dedupApproxVerify _),
    "dedup_segments"       -> (dedupSegments _),
    "dedup_lines_intra"    -> (dedupLinesIntra _),
    "dedup_incremental"    -> (dedupIncremental _),
    "dedup_snapshot_diff"  -> (dedupSnapshotDiff _),
    "dedup_spans"          -> (dedupSpans _),
    "dedup_strip_spans"    -> (dedupStripSpans _),
    "dedup_contam_spans"   -> (dedupContamSpans _),
    "dedup_strip_contam"   -> (dedupStripContam _),
    "dedup_semantic_verify" -> (dedupSemanticVerify _),
    "dedup_bloom_verify"   -> (dedupBloomVerify _),
    "dedup_ref_exact"      -> (dedupRefExact _),
    "dedup_simhash_verify" -> (dedupSimhashVerify _),
    "dedup_cross_simhash_verify" -> (dedupCrossSimhashVerify _),
    "dedup_clusters"       -> (dedupClusters _),
    "dedup_cluster_update" -> (dedupClusterUpdate _),
    "dedup_survivors"      -> (dedupSurvivors _),
    "dedup_survivors_from_map" -> (dedupSurvivorsFromMap _),
    "dedup_cluster_sizes"  -> (dedupClusterSizes _),
    "dedup_survivors_best" -> (dedupSurvivorsBest _)
  )

  /** Bench shapes whose math is hash-certified by the `*_verify` rows
   *  above (`dedup_simhash_verify` re-derives hamming + blocking recall
   *  over the materialized signature table; `dedup_semantic_verify` the
   *  centroid-assignment + cosine math; `dedup_bloom_verify` the probe
   *  contract over the materialized decisions; `dedup_approx_verify` the
   *  HLL error bound over the materialized counts). Kept on the benchmark
   *  board; excluded from the correctness surface where an engine-internal
   *  signature/sketch dump would read as an unverifiable row. */
  override val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_simhash"         -> (dedupSimhash _),
    "dedup_semantic"        -> (dedupSemantic _),
    "dedup_bloom_ref"       -> (dedupBloomRef _),
    "dedup_approx_distinct" -> (approxDistinct _)
  )

  override val oracles: Map[String, String] = Map(
    "dedup_exact"         -> dedupExactSql,
    "dedup_fuzzy_key"     -> fuzzyKeySql,
    "dedup_fuzzy_clusters" -> fuzzyClustersSql,
    "dedup_minhash_lsh"   -> dedupMinhashSql,
    "dedup_cross_minhash" -> dedupCrossMinhashSql,
    "dedup_ngram_jaccard" -> dedupNgramSql,
    "dedup_containment"   -> dedupContainmentSql,
    "dedup_allpairs"      -> dedupAllPairsSql,
    "dedup_embedding"     -> dedupEmbeddingSql,
    "dedup_embed_contam"  -> dedupEmbedContamSql,
    "dedup_segments"      -> dedupSegmentsSql,
    "dedup_lines_intra"   -> dedupLinesIntraSql,
    "dedup_incremental"   -> dedupIncrementalSql,
    "dedup_snapshot_diff" -> dedupSnapshotDiffSql,
    "dedup_spans"         -> dedupSpansSql,
    "dedup_strip_spans"   -> dedupStripSpansSql,
    "dedup_contam_spans"  -> dedupContamSpansSql,
    "dedup_strip_contam"  -> dedupStripContamSql,
    "dedup_ref_exact"     -> dedupRefExactSql,
    "dedup_semantic_verify" -> dedupSemanticVerifySql,
    "dedup_simhash_verify" -> dedupSimhashVerifySql,
    "dedup_bloom_verify"  -> dedupBloomVerifySql,
    "dedup_approx_verify" -> dedupApproxVerifySql,
    "dedup_cross_simhash_verify" -> dedupCrossSimhashVerifySql,
    "dedup_clusters"      -> dedupClustersSql,
    "dedup_cluster_update" -> dedupClustersSql,
    "dedup_survivors"     -> dedupSurvivorsSql,
    "dedup_survivors_from_map" -> dedupSurvivorsSql,
    "dedup_cluster_sizes" -> dedupClusterSizesSql,
    "dedup_survivors_best" -> dedupSurvivorsBestSql
  )
}
