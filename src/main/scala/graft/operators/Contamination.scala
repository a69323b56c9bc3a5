package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training corpora: find corpus documents
 * sharing word n-gram shingles with a benchmark/eval set, the standard
 * pre-training hygiene step (n-gram-overlap decontamination à la GPT-3
 * appendix C / PaLM). Not in the reference (no text surface at all) —
 * SURVEY.md §2.6 north-star addition.
 *
 * Shape: inverted-index join on hashed shingles. The benchmark side is
 * small by nature (eval sets are thousands of docs, the corpus is
 * billions), so its exploded shingle index BROADCASTS — the corpus-side
 * pass is then map-only: shingle, probe, partial-count, one aggregation
 * shuffle keyed by (corpus doc, benchmark doc) pairs that actually
 * overlap. Nothing quadratic, no corpus-side index materialization.
 *
 * Per-doc shingles are DISTINCT (the sorted-hashed set builder shared
 * with MinHash), so the joined count is exactly |shingles(c) ∩
 * shingles(b)| — the DuckDB oracle computes the same count on shingle
 * strings (equal up to a ~n²/2⁶⁵ hash collision).
 */
object Contamination {

  /** (corpus id, benchmark id, n_shared) for every pair sharing at least
   *  `minShared` distinct word `n`-gram shingles. */
  def ngramOverlap(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    val builders = org.apache.spark.sql.graft.GraftSetBuilders
    def shingled(df: DataFrame, as: String) = df
      .withColumn("ws", split(col(textCol), " "))
      .filter(size(col("ws")) >= n)
      .select(col(idCol).as(as),
        explode(builders.hashedWordShingles(col("ws"), n)).as("g"))
    val c = shingled(Par.spread(corpus, col(idCol)), "doc_id")
    val b = shingled(benchmark, "bench_id")
    c.join(broadcast(b), "g")
      .where(col("doc_id") =!= col("bench_id")) // self-overlap is not contamination
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
