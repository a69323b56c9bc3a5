package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic negative sampling — the contrastive-pair construction an
 * embedding-training pipeline runs over its corpus (k uniform-ish
 * negatives per anchor for InfoNCE/triplet losses). RNG-free: the t-th
 * negative of an anchor is picked by an integer mixer over (id, t) mapped
 * onto the corpus's GlobalSequence rank space, so pairs are
 * rerun/repartition/engine-stable and exactly replayable in SQL. A pick
 * that lands on the anchor itself deterministically re-rolls one step
 * (`pick % N + 1` — never self again for N ≥ 2).
 *
 * The mixer is a FIFTH (prime, multiplier) pair, independent of the
 * split/mixture/upsample/cluster-balance mixers, with the anchor and
 * slot terms mixed under the same overflow-free discipline (products
 * ≤ ~2.9e15 ≪ 2⁶³, so wrap-free in any engine).
 *
 * Not in the reference (no training surface); SURVEY.md §2.6 north-star
 * addition.
 *
 * 100 TB shape: one GlobalSequence rank pass (two fully-parallel stages),
 * a 1-row count broadcast, a map-side explode to k slots, and ONE
 * rank-keyed join (8-byte keys) to resolve picks to ids — candidates
 * never fan out beyond k·N rows and no similarity computation happens
 * here (pair construction only; hard-negative mining composes this with
 * [[Similarity]] downstream).
 */
object Contrastive {

  /** (anchor_id, t, negative_id): for every row of `df`, `k` deterministic
   *  negatives (t = 1..k). Requires ≥ 2 rows (a singleton corpus has no
   *  possible negative). */
  def negatives(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val ranked = GlobalSequence.withSequentialId(
      df.select(col(idCol)), col(idCol), "__rn")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val cands = ranked.crossJoin(broadcast(n))
      .withColumn("t", explode(sequence(lit(1L), lit(k.toLong))))
      .withColumn("__pick0",
        ((abs(col(idCol)) % lit(999959L)) * lit(2891336453L)
          + col("t") * lit(2654435761L)) % lit(4294967296L) % col("__n")
          + lit(1L))
      .withColumn("__pick",
        when(col("__pick0") === col("__rn"),
          col("__pick0") % col("__n") + lit(1L))
          .otherwise(col("__pick0")))
    cands.join(
        ranked.select(col(idCol).as("negative_id"), col("__rn").as("__nr")),
        col("__pick") === col("__nr"))
      .select(col(idCol).as("anchor_id"), col("t"), col("negative_id"))
  }
}
