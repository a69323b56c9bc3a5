package graft.operators

import org.apache.spark.sql.graft.GraftPq
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Product quantization for embedding search (Jégou et al. 2011) — the
 * index layout a 100 TB vector corpus actually affords. SURVEY.md §2.6
 * north-star addition, completing the similarity family's memory story:
 * `Quantize.int8` shrinks vectors 4×; PQ shrinks them dim·4/m bytes →
 * 32× for 64-dim/m=8 — the corpus index is (id, m small ints) and the
 * float vectors never need to be resident at query time.
 *
 *  - `train`: m independent sub-quantizers, each a deterministic
 *    [[Kmeans.train]] over one dsub-wide slice of the corpus (hash-order
 *    seeds + fixed-point sums ⇒ the whole codebook is rerun-stable).
 *    Driver traffic: m·ksub·dsub doubles — the codebook IS the model.
 *  - `encode`: map-only codegen'd argmin per subspace
 *    ([[org.apache.spark.sql.graft.PqEncode]]); corrupt rows drop rather
 *    than mis-encode.
 *  - `topK`: asymmetric-distance search — the exact query vector scores
 *    against each row's RECONSTRUCTION
 *    ([[org.apache.spark.sql.graft.PqAdcCosine]], fused per-pair loop).
 *    Approximation error comes only from quantizing the corpus side
 *    (that asymmetry is why ADC beats symmetric code-vs-code distance).
 *
 * 100 TB shape: scoring scans the slim code table (m ints + id per row,
 * broadcast queries) and cuts top-k via [[Similarity.cutTopK]]'s map-side
 * partial aggregate — the exchange carries ≤ k·16 B per (partition ×
 * query), never the scored candidate set. Compose with the IVF cell
 * column to prune the scan the same way `ivfProbedTopK` does — PQ
 * compresses WITHIN the cell layout, IVF prunes ACROSS cells; the two
 * multiply.
 */
object Pq {

  /** Train m sub-codebooks of ksub centroids each. The embedding dim (of
   *  the hash-smallest clean row, the same deterministic probe Kmeans
   *  uses) must divide evenly into m subspaces. Sub-quantizers train on
   *  the CLEAN full-dim rows only — a corrupt row (null element, odd
   *  dim) whose slice happens to look valid must not shape a codebook
   *  `encode` would reject the row for (a short row's tail slice could
   *  even seed a wrong-width sub-codebook and break rectangularity). The
   *  slim clean projection is cached for the m × (iters+1) passes the
   *  sub-trainers make, then released. */
  def train(df: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int, iters: Int = 3): Array[Array[Array[Double]]] = {
    require(m >= 1, "need m >= 1")
    val clean = df.where(col(vecCol).isNotNull &&
      !exists(col(vecCol), _.isNull) && size(col(vecCol)) > 0)
    val dim = clean
      .select(size(col(vecCol)).as("d"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(1).select(col("d")).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException(
        s"no non-null '$vecCol' rows to train PQ from")
    }
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val base = clean.where(size(col(vecCol)) === dim)
      .select(col(idCol), col(vecCol)).persist()
    try {
      (0 until m).map { j =>
        val sub = base.select(col(idCol),
          slice(col(vecCol), j * dsub + 1, dsub).as("sub"))
        Kmeans.train(sub, "sub", idCol, ksub, iters)
      }.toArray
    } finally base.unpersist(blocking = false)
  }

  /** The PQ index: (id, codes) — m small ints per row; corrupt rows
   *  (wrong dim / null elements) are dropped, never mis-encoded. */
  def encode(df: DataFrame, vecCol: String, idCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol),
      GraftPq.pqEncode(col(vecCol), codebooks).as("codes"))
      .where(col("codes").isNotNull)

  /** ADC top-k: exact query vectors against the encoded corpus.
   *  (query_id, neighbor_id, rk) like the other similarity searches. */
  def topK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame =
    searchIndex(
      encode(Par.spread(corpus, col(idCol)), vecCol, idCol, codebooks)
        .select(col(idCol).as("neighbor_id"), col("codes")),
      queries, vecCol, idCol, codebooks, k)

  /** ADC top-k over a PREBUILT (neighbor_id, codes) index — the
   *  production search shape: the index is encoded once at ingest, stored
   *  (m small ints + id per row), and scanned here without the float
   *  vectors ever being resident. [[topK]] is encode-then-search over
   *  this. */
  def searchIndex(index: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    Similarity.cutTopK(
      index.crossJoin(broadcast(q))
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos",
          GraftPq.pqAdcCosine(col("q_vec"), col("codes"), codebooks)),
      k)
  }

  /** The trained codebooks as a DataFrame — (sub, code, vals): sub-space
   *  index, centroid index within it, and the dsub-wide centroid — the
   *  relational form a catalog stores and a cross-engine oracle reads. */
  def codebooksDf(s: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val rows = for {
      (cb, sub) <- codebooks.zipWithIndex
      (vals, code) <- cb.zipWithIndex
    } yield (sub, code, vals.toSeq)
    s.createDataFrame(rows.toSeq).toDF("sub", "code", "vals")
  }

  /** Coarse centroids as a DataFrame — (cell, vals) with the EXACT double
   *  values the residual reconstruction adds — so a cross-engine oracle
   *  replays `cent[i] + sub_centroid[i]` operand-for-operand. */
  def centroidsDf(s: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame =
    s.createDataFrame(
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "vals")

  // ---- Residual (IVF-centered) PQ — the FAISS composition ---------------

  /** (id, cell, res): each clean row's coarse cell plus its residual
   *  v − centroid(cell), computed in f32 (the alphabet the sub-trainers
   *  and encoder both consume, so train and encode see identical
   *  vectors). The centroid table is a #cells-row broadcast. */
  private def residuals(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.graft.GraftKmeans
    val centDf = df.sparkSession.createDataFrame(
        centroids.zipWithIndex.toSeq.map { case (c, i) =>
          (i, c.map(_.toFloat).toSeq) })
      .toDF("cell", "cent")
    df.select(col(idCol), col(vecCol).as("__v"),
        GraftKmeans.nearestCentroid(col(vecCol), centroids).as("cell"))
      .where(col("cell").isNotNull)
      .join(broadcast(centDf), "cell")
      .select(col(idCol), col("cell"),
        zip_with(col("__v"), col("cent"), (a, b) => a - b).as("res"))
  }

  /**
   * Train residual sub-codebooks: PQ over `v − centroid(cell)` instead of
   * `v` — the standard FAISS IVF+PQ composition and the recall lever at a
   * FIXED m/ksub budget: residual norms shrink with the coarse
   * quantizer's resolution, so the same 4-bit-per-subspace budget spends
   * itself on a much smaller ball (measured on the sf0.01 adversarial
   * corpus: recall@5 0.344 plain → 0.64 residual at 256 cells, identical
   * per-row index bytes). 100 TB shape: one extra broadcast join against
   * the #cells-row centroid table on top of [[train]]'s cost; the
   * residual projection is a per-row map (zip_with is interpreted but
   * per-row/per-element — training-time work, not the per-pair hot path).
   */
  def trainResidual(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int = 3): Array[Array[Array[Double]]] =
    train(residuals(df, vecCol, idCol, centroids), "res", idCol,
      m, ksub, iters)

  /** The residual-PQ index: (id, cell, codes) — one coarse cell plus m
   *  small ints per row; corrupt rows drop, never mis-encode. */
  def encodeResidual(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    residuals(df, vecCol, idCol, centroids)
      .select(col(idCol), col("cell"),
        GraftPq.pqEncode(col("res"), codebooks).as("codes"))
      .where(col("codes").isNotNull)

  /** Residual-ADC top-k over a PREBUILT (neighbor_id, cell, codes) index:
   *  exact query vectors against `centroid(cell) + decode(codes)`
   *  reconstructions — exhaustive (no cell pruning), the recall-ceiling
   *  search and the verify surface. Same broadcast-queries map-side shape
   *  as [[searchIndex]]. */
  def searchResidualIndex(index: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    Similarity.cutTopK(
      index.crossJoin(broadcast(q))
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", GraftPq.pqResidualAdcCosine(
          col("q_vec"), col("cell"), col("codes"), centroids, codebooks)),
      k)
  }

  /** Exhaustive residual-ADC top-k: encode-then-search over the corpus. */
  def residualTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame =
    searchResidualIndex(
      encodeResidual(Par.spread(corpus, col(idCol)), vecCol, idCol,
        centroids, codebooks)
        .select(col(idCol).as("neighbor_id"), col("cell"), col("codes")),
      queries, vecCol, idCol, centroids, codebooks, k)

  /** IVF×residual-PQ — the full production layout: coarse cells prune the
   *  scan (queries explode their nprobe nearest cells), residual codes
   *  compress within them, reconstruction re-centers on the row's cell.
   *  Same compose-multiplicatively shape as [[ivfTopK]], strictly better
   *  recall at the same bytes. */
  def residualIvfTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.graft.GraftKmeans
    val c = encodeResidual(Par.spread(corpus, col(idCol)), vecCol, idCol,
        centroids, codebooks)
      .select(col(idCol).as("neighbor_id"), col("cell"), col("codes"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(GraftKmeans.nearestCentroids(col(vecCol), centroids, nprobe))
          .as("cell"))
    Similarity.cutTopK(
      q.join(c, "cell")
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", GraftPq.pqResidualAdcCosine(
          col("q_vec"), col("cell"), col("codes"), centroids, codebooks)),
      k)
  }

  /**
   * ANN-assisted near-duplicate pairs over a residual-PQ index — the
   * quadratic stage of the `pipeline_ann_dedup` funnel as a first-class
   * operator: within each coarse cell, every unordered pair {x, y} (x < y)
   * is prefiltered by the 16-byte residual-ADC estimate
   * `cos(v_x, reconstruct(codes_y)) >= adcTau`, and only the surviving
   * sliver is verified by the exact double-accumulated cosine. Emits the
   * verified (a, b) pairs, a < b.
   *
   * Skew shape: the in-cell pair space routes through the same salted
   * triangle as [[Dedup.embeddingCosine]] — a hot IVF cell spreads its
   * C(n,2) ADC loop over S(S+1)/2 salt cells instead of serializing on
   * one task. The ADC estimate is DIRECTIONAL (exact vector on one side,
   * codes on the other), and the triangle orients pairs by salt, not id —
   * so both payloads ride both sides and the estimate is canonicalized by
   * id (`ADC(v_min, codes_max)` always, branch-selected per row). That
   * keeps output independent of salting (saltBuckets = 1 ≡ any S,
   * PqSpec-pinned) and lets a cross-engine oracle replay the funnel with
   * a plain `a < b` join. Cost: vectors replicate ~S/2+1× through one
   * linear shuffle (the [[Dedup.embeddingCosine]] trade — and it buys
   * back the post-prefilter vector re-join: the exact verify reads
   * vectors already in-row); the quadratic per-pair work still touches
   * only the m-byte codes.
   *
   * `index` must carry (`idCol`, cell, codes) as produced by
   * [[encodeResidual]]; `vectors` carries (`idCol`, `vecCol`).
   */
  def residualNearDupPairs(index: DataFrame, vectors: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      adcTau: Double, exactTau: Double, saltBuckets: Int = 4): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val base = index.select(col(idCol).as("id"), col("cell"), col("codes"))
      .join(vectors.select(col(idCol).as("id"), col(vecCol).as("v")), "id")
      .withColumn("salt",
        pmod(xxhash64(col("id")), lit(saltBuckets)).cast("int"))
    // Same cell enumeration as Dedup.embeddingCosine: left covers
    // (salt, sb >= salt), right (sa <= salt, salt) — each unordered
    // salt-pair cell joins once; diagonal duplicates fall to the id filter.
    val left = base
      .withColumn("sb", explode(expr(s"sequence(salt, ${saltBuckets - 1})")))
      .select(col("id").as("id_a"), col("cell"), col("v").as("v_a"),
        col("codes").as("codes_a"), col("salt").as("sa"), col("sb"))
    val right = base
      .withColumn("sa", explode(expr("sequence(0, salt)")))
      .select(col("id").as("id_b"), col("cell"), col("v").as("v_b"),
        col("codes").as("codes_b"), col("sa"), col("salt").as("sb"))
    val adcCanonical = when(col("id_a") < col("id_b"),
        GraftPq.pqResidualAdcCosine(col("v_a"), col("cell"),
          col("codes_b"), centroids, codebooks))
      .otherwise(
        GraftPq.pqResidualAdcCosine(col("v_b"), col("cell"),
          col("codes_a"), centroids, codebooks))
    left.join(right, Seq("cell", "sa", "sb"))
      .where(col("sa") < col("sb") || col("id_a") < col("id_b"))
      .where(adcCanonical >= adcTau)
      .where(graft.functions.TextHash.cosine("v_a", "v_b") >= exactTau)
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
  }

  /** IVF×PQ — the production ANN layout (FAISS's IVFPQ): the corpus index
   *  is (cell, codes) — one coarse cell + m small ints per row — queries
   *  explode their `nprobe` nearest cells
   *  ([[org.apache.spark.sql.graft.NearestCentroids]]) and ADC-score only
   *  in-cell candidates. IVF prunes ACROSS cells (candidate fraction ≈
   *  nprobe/k(cells)), PQ compresses WITHIN them (m ints vs dim floats);
   *  the two compose multiplicatively, and probing still multiplies only
   *  the slim query side. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.graft.GraftKmeans
    val c = Par.spread(corpus, col(idCol))
      .select(col(idCol).as("neighbor_id"),
        GraftKmeans.nearestCentroid(col(vecCol), centroids).as("cell"),
        GraftPq.pqEncode(col(vecCol), codebooks).as("codes"))
      .where(col("cell").isNotNull && col("codes").isNotNull)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(GraftKmeans.nearestCentroids(col(vecCol), centroids, nprobe))
          .as("cell"))
    Similarity.cutTopK(
      q.join(c, "cell")
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos",
          GraftPq.pqAdcCosine(col("q_vec"), col("codes"), codebooks)),
      k)
  }
}
