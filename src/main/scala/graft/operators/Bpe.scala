package graft.operators

import org.apache.spark.sql.graft.GraftBpe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units") — the tokenizer-training
 * pass of an LLM data pipeline. Not in the reference (no text surface) —
 * SURVEY.md §2.6 north-star addition, the induction counterpart of
 * `TextAnalysis.vocabulary`/`bpeTokenCount` (which apply fixed rules).
 *
 * Classic BPE trains on the WORD-FREQUENCY dictionary, not the corpus:
 * one corpus pass builds `(word, count)`, then every merge round works on
 * distinct words only. That is the whole scale story — a 100 TB corpus has
 * a word dictionary orders of magnitude smaller (Heaps' law), and the
 * corpus itself is never touched again:
 *  - round shuffle: adjacent-pair partial counts (map-side combine over
 *    the dictionary — `AdjacentPairs` native per-row loop, explode,
 *    weighted sum);
 *  - driver traffic per round: ONE row (the argmax pair) — the same
 *    broadcast-equivalent-bytes discipline as `Kmeans.train`;
 *  - merge application: map-only native pass (`ApplyBpeMerge`) over the
 *    dictionary; `localCheckpoint` caps the k-deep lineage exactly like
 *    `Clusters.connectedComponents` does per star round.
 *
 * Determinism: ties break on (count desc, pair asc) — a total order, so
 * the merge list is rerun/partition-order stable. Matches the
 * single-threaded reference algorithm exactly (spec pins equality against
 * an in-memory reimplementation).
 */
object Bpe {

  /** The trained merge list: (step, pair, freq) — step is 1-based merge
   *  order, pair is "left right", freq the weighted count at selection
   *  time. Stops early (fewer than `merges` rows) when no pair reaches
   *  `minFreq`. */
  def train(
      df: DataFrame, textCol: String, merges: Int,
      minFreq: Long = 2): DataFrame = {
    require(merges >= 1, "need merges >= 1")
    require(minFreq >= 1, "need minFreq >= 1")
    val spark = df.sparkSession

    // One corpus pass: the word-frequency dictionary, symbols = chars.
    var dict = Par.spread(
        df.select(explode(split(col(textCol), " ")).as("word"))
          .where(length(col("word")) > 0), col("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      // split(w, "") keeps a trailing "" under Spark's limit=-1 semantics;
      // drop empty symbols so pairs never contain phantom elements.
      .select(filter(split(col("word"), ""), x => length(x) > 0).as("symbols"),
        col("n"))
      .localCheckpoint()

    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val top = dict
        .select(explode(GraftBpe.adjacentPairs(col("symbols"))).as("pair"), col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("freq"))
        .where(col("freq") >= minFreq)
        .orderBy(col("freq").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (pair, freq) = (top(0).getString(0), top(0).getLong(1))
        picked += ((step, pair, freq))
        dict = dict
          .select(GraftBpe.applyMerge(col("symbols"), lit(pair)).as("symbols"), col("n"))
          .localCheckpoint()
        step += 1
      }
    }
    spark.createDataFrame(picked.toSeq)
      .toDF("step", "pair", "freq")
      .select(col("step").cast("long").as("step"), col("pair"), col("freq"))
  }

  /** Apply a trained merge list to the corpus — the tokenizer-application
   *  face of `train`: every word re-encodes under rank-greedy BPE (lowest-
   *  rank present pair fuses first, all occurrences per round — the
   *  standard tokenizer loop), output is (id, n_subwords). Map-only native
   *  pass ([[org.apache.spark.sql.graft.BpeEncodeWords]] — merge table
   *  bound by closure like a broadcast model), zero shuffles at any
   *  scale. */
  def encode(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[String]): DataFrame =
    df.select(col(idCol),
      size(GraftBpe.encodeWords(split(col(textCol), " "), merges))
        .cast("long").as("n_subwords"))

  /** Unsigned UTF-8 byte order — what Spark's `orderBy` on a string
   *  column compares (UTF8String.compareTo); Java String order (UTF-16)
   *  disagrees for supplementary vs U+E000–U+FFFF characters, so the
   *  reference must mirror the engine's order for tie-breaks to match. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Code-point symbols — the alphabet Spark's split(word, "") produces
   *  (zero-width regex never splits a surrogate pair). */
  private[graft] def codePointSymbols(w: String): Seq[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toSeq

  /** Reference in-memory BPE over a (word -> count) dictionary — the
   *  ground truth the spec compares `train` against (same code-point
   *  alphabet, same UTF-8-byte-order tie-break). */
  private[graft] def referenceMerges(
      wordCounts: Map[String, Long], merges: Int,
      minFreq: Long = 2): Seq[(Int, String, Long)] = {
    var dict: Seq[(Seq[String], Long)] =
      wordCounts.toSeq.map { case (w, n) => (codePointSymbols(w), n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      dict.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = p.mkString(" ")
          counts(k) = counts.getOrElse(k, 0L) + n
        }
      }
      val eligible = counts.filter(_._2 >= minFreq)
      if (eligible.isEmpty) done = true
      else {
        val (pair, freq) = eligible.reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && utf8Less(b._1, a._1))) b else a
        }
        out += ((step, pair, freq))
        val Array(a, b) = pair.split(" ", 2)
        dict = dict.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toSeq, n)
        }
        step += 1
      }
    }
    out.toSeq
  }
}
