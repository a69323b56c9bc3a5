package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact duplicated-substring detection and removal — the token-level
 * ExactSubstr method ("Deduplicating Training Data Makes Language Models
 * Better", Lee et al. 2022) re-expressed for Spark. Not in the reference
 * (no text surface) — SURVEY.md §2.6 north-star addition. Complements the
 * document-level dedup family: `Dedup.exact`/`minHashLsh` drop whole
 * documents, `Dedup.segmentDedup` drops exact repeated LINES, this finds
 * and strips repeated token RUNS anywhere inside otherwise-unique
 * documents (boilerplate paragraphs, licence headers, quoted replies).
 *
 * Method: every token position starts a word `n`-gram; a position is
 * COVERED when its n-gram occurs ≥ `minOccurrences` times corpus-wide
 * (same-document repeats count — self-plagiarised boilerplate is still
 * boilerplate). Overlapping/adjacent covered windows merge into maximal
 * spans per document (gaps-and-islands), so a duplicated run of any
 * length ≥ n reports as ONE `[span_start, span_end]` token interval.
 *
 * 100 TB shape, stage by stage:
 *  - n-gram hashing is a native per-row loop
 *    ([[org.apache.spark.sql.graft.PositionedWordShingles]] — one XXH64
 *    per position, no interpreted lambdas), fused next to the scan;
 *  - duplicate detection shuffles (hash, partial count) pairs — 8-byte
 *    keys with map-side combine, never gram text;
 *  - the covered-position pass is a semi-join of positions against the
 *    duplicated-hash set on the same 8-byte key (AQE picks
 *    broadcast/shuffle by the dup set's measured size — boilerplate
 *    vocabularies are small relative to corpora);
 *  - island-merging windows partition by document, bounded by document
 *    length — no global or single-partition window exists in the plan.
 *
 * Oracle: positions and merged intervals are exact integers; DuckDB
 * computes the identical spans from literal gram strings (`dedup_spans`
 * hash-matches; Spark-side hashing differs only by a ~positions²/2⁶⁵
 * collision chance).
 */
object Spans {

  /** Maximal duplicated token spans per document:
   *  (doc_id, span_start, span_end) — token indices, 0-based inclusive.
   *  A span is the union of overlapping/adjacent duplicated n-gram
   *  windows: every TOKEN in it lies inside at least one window whose
   *  n-gram occurs ≥ `minOccurrences` times corpus-wide (interior grams
   *  that straddle two merged windows need not themselves be
   *  duplicated). */
  def duplicateSpans(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minOccurrences: Int = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minOccurrences >= 2, "minOccurrences must be >= 2")
    val grams = positionedGrams(df, textCol, idCol, n)
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minOccurrences)
      .select(col("g"))
    mergeIslands(grams.join(dup, "g").select(col("doc_id"), col("pos")), n)
  }

  /**
   * Cross-corpus CONTAMINATED spans: maximal token runs in `corpus`
   * documents whose word n-grams appear anywhere in a REFERENCE corpus —
   * substring-level decontamination (the eval-overlap scrub of the GPT-3
   * appendix / Lee et al. 2022 §6, where containing an eval n-gram
   * taints the span, not the whole document). Complements
   * [[graft.operators.Dedup.minHashLshAgainst]] (document-level) the way
   * [[duplicateSpans]] complements self-dedup: a training doc QUOTING a
   * benchmark item keeps its clean remainder.
   *
   * 100 TB shape: identical to the self-corpus path except the
   * duplicated-hash set comes from the reference side — distinct 8-byte
   * gram hashes of the (typically benchmark-sized) reference, so the
   * semi-join broadcasts; corpus text never shuffles, per-doc windows
   * stay doc-bounded.
   */
  def contaminatedSpans(
      corpus: DataFrame, ref: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val grams = positionedGrams(corpus, textCol, idCol, n)
    val refGrams = positionedGrams(ref, textCol, idCol, n)
      .select(col("g")).distinct()
    mergeIslands(grams.join(refGrams, "g").select(col("doc_id"), col("pos")), n)
  }

  /** `corpus` with every reference-contaminated span removed — the strip
   *  consumer of [[contaminatedSpans]], same contract as [[stripSpans]]
   *  (fully-contaminated docs come back as empty strings). */
  def stripContaminated(
      corpus: DataFrame, ref: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame =
    stripByPositions(corpus, textCol, idCol,
      contaminatedSpans(corpus, ref, textCol, idCol, n))

  /** (doc_id, pos, g): one XXH64 gram hash per token position — native
   *  per-row loop fused next to the scan. */
  private def positionedGrams(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val builders = org.apache.spark.sql.graft.GraftSetBuilders
    Par.spread(df, col(idCol))
      .select(col(idCol).as("doc_id"),
        posexplode(builders.positionedWordShingles(split(col(textCol), " "), n)))
      .toDF("doc_id", "pos", "g")
  }

  /** Merge covered positions into maximal spans (gaps-and-islands over
   *  doc-bounded windows). Sorted same-length windows merge iff the next
   *  start is within n of the previous (overlap or exact adjacency). */
  private def mergeIslands(covered: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + n, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Documents with every duplicated span removed: (doc_id, text) where
   *  `text` keeps only tokens outside the spans `duplicateSpans` reports
   *  (aggressive mode — ALL occurrences drop; rerun-deterministic, unlike
   *  keep-first which depends on a global document order). Documents
   *  containing nothing but boilerplate come back as empty strings rather
   *  than disappearing — downstream length filters decide their fate. */
  def stripSpans(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minOccurrences: Int = 2): DataFrame =
    stripByPositions(df, textCol, idCol,
      duplicateSpans(df, textCol, idCol, n, minOccurrences))

  /** Rebuild each document keeping only tokens outside `spans`. */
  private def stripByPositions(
      df: DataFrame, textCol: String, idCol: String,
      spans: DataFrame): DataFrame = {
    val coveredPos = spans.select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " "))).toDF("doc_id", "pos", "tok")
      .withColumn("pos", col("pos").cast("long"))
    val kept = toks.join(coveredPos, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("kept_text"))
    // A fully-covered document loses every token to the anti-join; the
    // left join restores it as an explicit empty string.
    df.select(col(idCol).as("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("kept_text"), lit("")).as("text"))
  }
}
