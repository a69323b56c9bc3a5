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
