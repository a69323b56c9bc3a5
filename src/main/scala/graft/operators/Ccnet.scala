package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CCNet-style paragraph-level LM quality partitioning (Wenzek et al.
 * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
 * Crawl Data"): score every PARAGRAPH of every document under a language
 * model trained on the corpus, aggregate to a per-document mean
 * log-likelihood, and partition the corpus into quality buckets
 * (CCNet's head/middle/tail terciles by perplexity). The published
 * recipe behind "keep the head of Common Crawl"; not in the reference
 * (no corpus surface); SURVEY.md §2.6 north-star addition.
 *
 * The LM is the corpus-trained add-one-smoothed bigram model of
 * [[TextAnalysis.bigramLmScore]], fitted at paragraph granularity —
 * bigrams never span a paragraph boundary, which is exactly CCNet's unit
 * of scoring (it scores paragraphs, then aggregates per page). Log
 * likelihoods floor to integer micro-nats per bigram BEFORE any sum
 * (the FP-aggregate discipline), so scores and the final bucket
 * assignment replay exactly cross-engine.
 *
 * 100 TB shape: the paragraph explode is a narrow map; the model is two
 * hash aggregates keyed by (w1, w2) / (w1) — shuffles carry token pairs
 * and counts, never documents — and a one-row vocab aggregate that
 * BROADCASTS into the scoring join. Per-paragraph scores re-aggregate on
 * (doc, para) then (doc). The bucket assignment uses the exact two-pass
 * range-partition rank ([[GlobalSequence]]) — no single-partition
 * window anywhere. Model size is bounded by distinct bigrams, not corpus
 * size; at trillion-token scale swap the exact model for a pruned
 * min-frequency table (one extra HAVING) without touching the shape.
 */
object Ccnet {

  /** Per-paragraph LM scores: (doc_id, para_idx, n_bigrams,
   *  ll_sum_micro). Paragraphs with fewer than 2 tokens contribute no
   *  bigrams and no row (same convention as the doc-level LM). */
  def paragraphScores(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), sep)).as(Seq("para_idx", "ptext")))
      .select(col("doc_id"), col("para_idx").cast("long").as("para_idx"),
        TextAnalysis.wsTokens(col("ptext")).as("ws"))
    val pairs = toks.where(size(col("ws")) >= 2)
      .select(col("doc_id"), col("para_idx"), explode(org.apache.spark.sql.graft.GraftBpe
        .adjacentPairStructs(col("ws"))).as("bg"))
      .select(col("doc_id"), col("para_idx"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val model2 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val model1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("ws")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    pairs
      .join(model2, Seq("w1", "w2")).join(model1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("ll_micro",
        floor(lit(1e6) * log(
          (col("c12").cast("double") + lit(1.0)) /
            (col("c1").cast("double") + col("v").cast("double"))))
          .cast("long"))
      .groupBy(col("doc_id"), col("para_idx"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ll_micro")).as("ll_sum_micro"))
  }

  /** CCNet's corpus partition: per-document mean per-bigram log
   *  likelihood under the paragraph model, exact-ranked best-first, cut
   *  into k quality buckets — (doc_id, n_bigrams, ll_sum_micro,
   *  mean_ll_micro, rn, ccnet_bucket) with bucket 1 = head (likeliest /
   *  lowest perplexity), k = tail. Documents with no scoreable
   *  paragraph are absent (the caller decides their fate, as with the
   *  doc-level LM). */
  def partition(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, sep: String = "\n"): DataFrame = {
    require(k >= 1, "need k >= 1")
    val doc = paragraphScores(df, textCol, idCol, sep)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_bigrams")).cast("long").as("n_bigrams"),
        sum(col("ll_sum_micro")).cast("long").as("ll_sum_micro"))
      .withColumn("mean_ll_micro",
        floor(col("ll_sum_micro").cast("double") /
          col("n_bigrams").cast("double")).cast("long"))
    val buckets = Sampling.quantileBuckets(
      doc.withColumn("__neg", -col("mean_ll_micro")), "__neg", "doc_id", k)
    doc.join(
      buckets.select(col("doc_id"), col("rn"),
        col("bucket").cast("long").as("ccnet_bucket")),
      "doc_id")
  }
}
