package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data Selection via Importance Resampling — the DSIR recipe (Xie et al.
 * 2023, "Data Selection for Language Models via Importance Resampling"):
 * score every raw-corpus document by how much more likely its hashed
 * n-gram features are under a bag-of-features model of a TARGET domain
 * than under the model of the raw corpus itself, then keep the
 * highest-weight documents. The published production recipe for "give me
 * web data that reads like my curated domain" — not in the reference (no
 * corpus-selection surface); SURVEY.md §2.6 north-star addition.
 *
 * Featurization is hashed word-bigram counts (the paper's hashed n-gram
 * features): bucket = xxhash64(w1, w2) mod B, so both models are dense
 * B-bucket multinomials regardless of vocabulary size. Log importance
 * weights are computed in integer micro-nats — each bucket's smoothed
 * log-ratio floors to a BIGINT BEFORE the per-document sum (the
 * FP-aggregate discipline every LM score here follows), so weights are
 * exact under any partitioning and replay cross-engine from the
 * materialized count tables.
 *
 * 100 TB shape: featurization is a map-side explode + partial-aggregated
 * count keyed by (doc, bucket) — the only shuffle that scales with the
 * corpus, and it carries 16-byte keyed counts, never text. Each model is
 * ≤ B rows (one tiny aggregate; B ~ 10⁴-10⁵), the bucket→ratio table is
 * ≤ B rows and BROADCASTS to the scoring join, and per-doc weights
 * re-aggregate on the same (doc, bucket) keys. Selection is a global
 * TakeOrdered of k ids. Nothing quadratic, no driver traffic beyond the
 * ratio table a broadcast ships anyway.
 */
object Dsir {

  /** Hashed word-bigram feature counts: (doc_id, bucket, cnt). Documents
   *  with fewer than 2 whitespace tokens contribute no features (same
   *  convention as [[TextAnalysis.bigramLmScore]]). */
  def hashedBigramCounts(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, "need buckets >= 2")
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(org.apache.spark.sql.graft.GraftBpe
        .adjacentPairStructs(col("ws"))).as("bg"))
      .select(col("doc_id"),
        pmod(xxhash64(col("bg.w1"), col("bg.w2")), lit(buckets.toLong))
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket importance log-ratio table from pre-featurized counts:
   *  (bucket, r_micro) where r_micro = floor(1e6·ln p̂_target(b)) −
   *  floor(1e6·ln p̂_source(b)) under add-one smoothing over B buckets —
   *  ≤ B exact-integer rows, the broadcastable "trained model" of DSIR.
   *  Public seam so a 100 TB run can train once and score many shards
   *  (the trained-artifact discipline the quantizer/codebook paths use). */
  def bucketRatios(sourceCounts: DataFrame, targetCounts: DataFrame,
      buckets: Int): DataFrame = {
    val b = buckets.toDouble
    val srcB = sourceCounts.groupBy(col("bucket")).agg(sum(col("cnt")).as("cs"))
    val tgtB = targetCounts.groupBy(col("bucket")).agg(sum(col("cnt")).as("ct"))
    val totS = sourceCounts.agg(sum(col("cnt")).as("ts"))
    val totT = targetCounts.agg(sum(col("cnt")).as("tt"))
    srcB.join(tgtB, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("cs", "ct"))
      .crossJoin(broadcast(totS)).crossJoin(broadcast(totT))
      .select(col("bucket"),
        (floor(lit(1e6) * log(
          (col("ct").cast("double") + lit(1.0)) /
            (col("tt").cast("double") + lit(b)))) -
         floor(lit(1e6) * log(
          (col("cs").cast("double") + lit(1.0)) /
            (col("ts").cast("double") + lit(b)))))
          .cast("long").as("r_micro"))
  }

  /** Per-document log importance weights from pre-featurized counts:
   *  (doc_id, n_feats, w_sum_micro) — n_feats bigram occurrences scored,
   *  w_sum_micro = Σ cnt·r_micro in integer micro-nats (w_sum_micro > 0 ⇔
   *  the document is likelier under the target model; mean per-feature
   *  weight = w_sum_micro / 1e6 / n_feats downstream). */
  def weightsFromCounts(sourceCounts: DataFrame, targetCounts: DataFrame,
      buckets: Int): DataFrame =
    sourceCounts
      .join(broadcast(bucketRatios(sourceCounts, targetCounts, buckets)), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_feats"),
        sum(col("cnt") * col("r_micro")).cast("long").as("w_sum_micro"))

  /** End-to-end DSIR weights: featurize the raw corpus and the target
   *  sample, fit both hashed-bigram models, and score every corpus
   *  document — (doc_id, n_feats, w_sum_micro). */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      textCol: String, idCol: String, buckets: Int = 10007): DataFrame =
    weightsFromCounts(
      hashedBigramCounts(corpus, textCol, idCol, buckets),
      hashedBigramCounts(target, textCol, idCol, buckets),
      buckets)

  /** The selection step: the k corpus documents most resembling the
   *  target, by Gumbel-perturbed importance weight — the paper's sampling
   *  without replacement, derandomized: u = (xxhash64(doc_id, seed) mod
   *  2²⁰ + 0.5)/2²⁰ gives a deterministic per-doc uniform, and
   *  w/temperature + (−ln(−ln u)) is exactly Gumbel top-k. temperature →
   *  0⁺ degenerates to hard top-k by weight. Global TakeOrdered of k
   *  slim rows; rerun/partition-order deterministic like every sampler
   *  here ([[Sampling]]'s integer-mixer discipline). */
  def resample(weights: DataFrame, k: Int, temperature: Double = 1.0,
      seed: Long = 7L): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(temperature >= 0.0, "need temperature >= 0")
    val w = col("w_sum_micro").cast("double") / lit(1e6)
    val u = (pmod(xxhash64(col("doc_id"), lit(seed)), lit(1L << 20))
      .cast("double") + lit(0.5)) / lit((1L << 20).toDouble)
    val key =
      if (temperature == 0.0) w
      else w / lit(temperature) - log(-log(u))
    weights.withColumn("__g", key)
      .orderBy(col("__g").desc, col("doc_id"))
      .limit(k)
      .drop("__g")
  }
}
