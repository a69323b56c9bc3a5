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

  /** Free a localCheckpoint'ed dict's blocks once the next round's
   *  checkpoint has materialized — without this, every merge round leaks
   *  one checkpointed copy of the dictionary for the life of the run
   *  (harmless at merges=10; a real storage leak at tokenizer-scale merge
   *  counts). The checkpointed Dataset's plan root is a LogicalRDD over
   *  the persisted internal RDD. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** The trained merge list: (step, pair, freq) — step is 1-based merge
   *  order, pair is "left right", freq the weighted count at selection
   *  time. Stops early (fewer than `merges` rows) when no pair reaches
   *  `minFreq`.
   *
   *  Merge rounds are BATCHED (`batch` merges per distributed round) with
   *  an exact safety rule, so the output is bit-identical to one-merge-
   *  at-a-time training (BpeSpec pins equality against the in-memory
   *  reference at several batch sizes) while the number of sequential
   *  Spark jobs drops from ~2·V to ~3·V/batch — the difference between
   *  32k scheduler round-trips and ~4k for a production-size vocabulary.
   *
   *  Safety rule (why the committed prefix equals sequential training):
   *  scan the ranked candidates IN ORDER and accept while mutually
   *  non-interacting — no shared endpoint symbol and no endpoint equal to
   *  another accepted pair's merged string — STOPPING at the first
   *  violation (never skipping, so the accepted set is an exact prefix of
   *  the ranking and every pair the batch touches ranks strictly after
   *  every accepted pick, else the scan would have stopped sooner).
   *  Non-interacting picks cannot change each other's counts, so each
   *  committed pick sees exactly the counts sequential training would.
   *  Two residual hazards can still make sequential training diverge
   *  mid-batch, and one tiny aggregate over the round's cached counts
   *  rules both out:
   *   - C > 0: some existing pair's endpoint is string-equal to a batch
   *     merged symbol ("ab" already a symbol while "a b" merges) — such a
   *     pair can GAIN count; commit only the first pick.
   *   - W: max freq over pairs whose LEFT endpoint is some accepted
   *     pick's right symbol b_j — the witnesses whose conversion creates
   *     (a_jb_j, y) pairs that can tie a later pick's freq and win the
   *     lexicographic tie-break (left-side creations (x, a_jb_j) are
   *     always safe: "x a_j" < "x a_jb_j" and the witness already ranks
   *     after the pick). Commit picks after the first only while their
   *     freq STRICTLY beats W; the rest defer to the next round's fresh
   *     counts. batch = 1 degenerates to the classic sequential loop. */
  def train(
      df: DataFrame, textCol: String, merges: Int,
      minFreq: Long = 2, batch: Int = 8): DataFrame = {
    require(merges >= 1, "need merges >= 1")
    require(minFreq >= 1, "need minFreq >= 1")
    require(batch >= 1, "need batch >= 1")
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
      val want = math.min(batch, merges - step + 1)
      // UNFILTERED adjacent-pair counts, cached once per round: feeds the
      // ranked pick and (for multi-merge rounds) the safety-bound probe.
      // minFreq applies only to candidate selection — the bound must see
      // sub-threshold pairs too (they can still be boosted by a merge).
      val counts = dict
        .select(explode(GraftBpe.adjacentPairs(col("symbols"))).as("pair"), col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("freq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val top = counts
          .where(col("freq") >= minFreq)
          .orderBy(col("freq").desc, col("pair").asc)
          .limit(want).collect()
        if (top.isEmpty) exhausted = true
        else {
          // Greedy prefix: accept in rank order while non-interacting;
          // stop (don't skip) at the first interaction.
          val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          val used = scala.collection.mutable.Set.empty[String]
          var halted = false
          top.foreach { r =>
            if (!halted) {
              val pair = r.getString(0)
              val Array(a, b) = pair.split(" ", 2)
              val syms = Seq(a, b, a + b)
              if (syms.exists(used.contains)) halted = true
              else { accepted += ((pair, r.getLong(1))); used ++= syms }
            }
          }
          // Safety probe: C (merged-symbol collision) and W (dangerous-
          // witness ceiling) — see the scaladoc for why these two bounds
          // make the committed prefix exactly equal sequential training.
          var commit = accepted.length
          if (accepted.length > 1) {
            val rights = accepted.map { case (p, _) => p.split(" ", 2)(1) }.distinct
            val merged = accepted.map { case (p, _) => p.split(" ", 2).mkString }
            val lhs = split(col("pair"), " ", 2).getItem(0)
            val rhs = split(col("pair"), " ", 2).getItem(1)
            val bounds = counts.agg(
              coalesce(max(when(lhs.isin(merged.toSeq: _*) || rhs.isin(merged.toSeq: _*),
                col("freq"))), lit(0L)).as("c_collide"),
              coalesce(max(when(lhs.isin(rights.toSeq: _*), col("freq"))), lit(0L))
                .as("w_witness")).head()
            val (cCollide, wWitness) = (bounds.getLong(0), bounds.getLong(1))
            commit =
              if (cCollide > 0L) 1
              else 1 + accepted.drop(1).takeWhile(_._2 > wWitness).length
          }
          val committed = accepted.take(commit)
          committed.foreach { case (pair, freq) =>
            picked += ((step, pair, freq)); step += 1
          }
          val prev = dict
          val mergedSymbols = committed.foldLeft(col("symbols")) {
            case (c, (pair, _)) => GraftBpe.applyMerge(c, lit(pair))
          }
          dict = dict.select(mergedSymbols.as("symbols"), col("n")).localCheckpoint()
          unpersistCheckpoint(prev)
        }
      } finally counts.unpersist(false)
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
