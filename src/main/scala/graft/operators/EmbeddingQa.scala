package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding-space label QA — the "is this dataset labeled sanely" audit a
 * training pipeline runs before trusting a labeled corpus: fit one
 * centroid per label, classify every vector to its nearest centroid, and
 * report the label × predicted-label confusion matrix. Off-diagonal mass
 * names the label pairs that blur together (mislabeled slices, duplicate
 * classes, embedding drift); the diagonal share is the corpus's
 * nearest-centroid separability. Companion to [[SemDedup]] (same
 * embedding column, quality instead of dedup).
 *
 * ALL arithmetic is integer, so the DuckDB oracle replays every verdict:
 * vector components quantize to `floor(x·scale)` and are SHIFTED by
 * `+scale` so every value is non-negative — Spark's `DIV` truncates
 * toward zero while DuckDB's `//` floors, and on non-negative operands
 * the two agree (same trick as the anomaly operators' cleared
 * inequalities). Distances are invariant under the common shift modulo
 * floor interactions, which both engines compute identically — bit-equal
 * is the contract, not real-analysis equality. The argmin tie-breaks
 * (dist² asc, label asc) — a total order.
 *
 * 100 TB shape: centroids are a (labels × dims) aggregate — the exchange
 * carries per-partition partial sums bounded by L·D, never vectors — and
 * broadcast back. The scoring grid groups (vector × label) partial
 * distances with map-side combine, so the second exchange carries L
 * slim rows per vector (L = label count, small by construction). The
 * argmin window partitions per vector — no global window. For a
 * latency-critical variant, collapse the scoring to the codegen'd
 * `NearestCentroid` argmin over broadcast double centroids
 * (org.apache.spark.sql.graft.KmeansExpressions) — engine-internal FP,
 * so rows-only checkable; THIS shape is the cross-engine-certified one.
 */
object EmbeddingQa {

  /** Integer per-label centroids: (label, i, c) with `i` 1-based and `c`
   *  the floored mean of the shifted quantized components. */
  def labelCentroids(df: DataFrame, vecCol: String, labelCol: String,
      scale: Long = 1000000L): DataFrame =
    quantized(df, vecCol, "__no_id", labelCol, scale)
      .groupBy(col("label"), col("i"))
      .agg(expr("CAST(sum(e) DIV count(1) AS BIGINT)").as("c"))

  /** Confusion matrix (label, pred, n) of the nearest-centroid classifier
   *  over the label centroids fitted on the same frame. */
  def confusion(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, scale: Long = 1000000L): DataFrame = {
    val e = quantized(df, vecCol, idCol, labelCol, scale)
    val cent = e.groupBy(col("label"), col("i"))
      .agg(expr("CAST(sum(e) DIV count(1) AS BIGINT)").as("c"))
      .select(col("label").as("clabel"), col("i"), col("c"))
    val dists = e.join(broadcast(cent), Seq("i"))
      .groupBy(col("vid"), col("label"), col("clabel"))
      .agg(sum((col("e") - col("c")) * (col("e") - col("c"))).as("dist2"))
    val win = Window.partitionBy(col("vid"))
      .orderBy(col("dist2"), col("clabel"))
    dists.withColumn("rk", row_number().over(win))
      .where(col("rk") === 1)
      .groupBy(col("label"), col("clabel").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Embedding drift monitor: per-label centroid shift between two corpus
   * snapshots (a re-embedded corpus, a new dump vs the ingested baseline)
   * — the "did the embedding space move" audit run before trusting an
   * ANN index built on the old snapshot. Output per label present in
   * BOTH snapshots: row counts, dims compared, and the squared L2
   * distance between the snapshots' integer centroids in quantized
   * units (`drift_l2sq`; callers compare against a budget like
   * (0.05·scale)²·dims). Same integer discipline as [[labelCentroids]],
   * so the verdict replays exactly cross-engine.
   *
   * 100 TB shape: two (labels × dims) centroid aggregates (partial sums
   * bounded by L·D) joined on (label, i) and re-aggregated to L rows —
   * vectors never pairwise-join, snapshots never co-shuffle.
   */
  def drift(ref: DataFrame, cur: DataFrame, vecCol: String,
      labelCol: String, scale: Long = 1000000L): DataFrame = {
    val rc = labelCentroids(ref, vecCol, labelCol, scale)
      .withColumnRenamed("c", "c_ref")
    val cc = labelCentroids(cur, vecCol, labelCol, scale)
      .withColumnRenamed("c", "c_cur")
    val d = rc.join(cc, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_dims"),
        sum((col("c_ref") - col("c_cur")) * (col("c_ref") - col("c_cur")))
          .cast("long").as("drift_l2sq"))
    val nr = ref.groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n_ref"))
    val nc = cur.groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n_cur"))
    d.join(nr, "label").join(nc, "label")
      .select(col("label"), col("n_ref"), col("n_cur"),
        col("n_dims"), col("drift_l2sq"))
  }

  /**
   * Inter-centroid separation matrix: squared L2 between every pair of
   * label centroids (a < b), in quantized units — the geometry audit
   * read NEXT TO [[confusion]]: two labels whose centroids sit closer
   * than their within-class spread will confuse any nearest-centroid
   * router, and a near-zero pair is the "merge these labels" signal for
   * curriculum/mixture design. Same integer discipline as [[drift]]
   * (floored-mean centroids of shifted quantized components), so every
   * cell replays exactly cross-engine.
   *
   * 100 TB shape: ONE (labels × dims) centroid aggregate (partial sums;
   * vectors never pairwise-join), then an L×L self-join of the L·D
   * centroid table on the dim index — output L(L−1)/2 rows, cost
   * bounded by labels², never corpus².
   */
  def centroidSeparation(df: DataFrame, vecCol: String, labelCol: String,
      scale: Long = 1000000L): DataFrame = {
    val cent = labelCentroids(df, vecCol, labelCol, scale)
      .localCheckpoint() // L·D rows, referenced twice (both join sides)
    val a = cent.select(col("label").as("label_a"), col("i"),
      col("c").as("c_a"))
    val b = cent.select(col("label").as("label_b"), col("i"),
      col("c").as("c_b"))
    a.join(b, Seq("i"))
      .where(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(count(lit(1)).as("n_dims"),
        sum((col("c_a") - col("c_b")) * (col("c_a") - col("c_b")))
          .cast("long").as("dist_l2sq"))
  }

  /**
   * Cluster-separation audit — the silhouette's integer-exact core: per
   * label, how tight the cluster is against its own centroid
   * (`sum_own_d2`), how far the nearest FOREIGN centroid sits
   * (`sum_other_d2`, min over other labels per vector), and how many
   * vectors are strictly better explained by their own centroid
   * (`n_separated`). `n_separated ≈ n_vecs` and `sum_other ≫ sum_own`
   * is a healthy labeling; the inverse is the "merge or relabel" signal
   * [[centroidSeparation]] localizes to a pair. Same quantized-integer
   * discipline as [[confusion]], so every cell replays cross-engine.
   *
   * 100 TB shape: one centroid aggregate broadcast back; the per-(vector
   * × label) distance table is n·L slim rows (L = label cardinality,
   * tens) partial-aggregated from the dim join — confusion's exact
   * envelope, localCheckpoint'ed once for its two consumers.
   */
  def separationAudit(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, scale: Long = 1000000L): DataFrame = {
    val e = quantized(df, vecCol, idCol, labelCol, scale)
    val cent = e.groupBy(col("label"), col("i"))
      .agg(expr("CAST(sum(e) DIV count(1) AS BIGINT)").as("c"))
      .select(col("label").as("clabel"), col("i"), col("c"))
    val dists = e.join(broadcast(cent), Seq("i"))
      .groupBy(col("vid"), col("label"), col("clabel"))
      .agg(sum((col("e") - col("c")) * (col("e") - col("c"))).as("d2"))
      .localCheckpoint() // own + min-other both read it
    val own = dists.where(col("label") === col("clabel"))
      .select(col("vid"), col("label"), col("d2").as("own_d2"))
    val other = dists.where(col("label") =!= col("clabel"))
      .groupBy(col("vid"), col("label"))
      .agg(min(col("d2")).as("min_other_d2"))
    own.join(other, Seq("vid", "label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("own_d2")).cast("long").as("sum_own_d2"),
        sum(col("min_other_d2")).cast("long").as("sum_other_d2"),
        sum(when(col("min_other_d2") > col("own_d2"), 1L).otherwise(0L))
          .as("n_separated"))
  }

  private def quantized(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, scale: Long): DataFrame = {
    val base =
      if (idCol == "__no_id") df.select(col(labelCol), col(vecCol))
      else df.select(col(idCol).as("vid"), col(labelCol), col(vecCol))
    val idCols =
      if (idCol == "__no_id") Seq.empty
      else Seq(col("vid"))
    base.select(idCols ++ Seq(
      col(labelCol).cast("long").as("label"),
      posexplode(col(vecCol))): _*)
      .select(idCols ++ Seq(
        col("label"),
        (col("pos") + 1).cast("long").as("i"),
        (floor(col("col").cast("double") * scale).cast("long") + scale)
          .as("e")): _*)
  }
}
