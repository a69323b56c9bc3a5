package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Deterministic sampling: keep the k rows with the smallest
 * xxhash64(id, salt) per group — uniform-ish, seedable, RNG-state-free,
 * stable across runs and cluster layouts. The single source of truth for
 * the `builtin:sample_group` lens op and the sampling queries.
 */
object Sampling {
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: Int = 42): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol), lit(salt)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Deterministic train/val/test assignment from the record id alone — no
   * RNG state, stable under reruns, repartitioning, and incremental
   * appends (a doc's split never changes when the corpus grows, unlike
   * `randomSplit`). Buckets come from a Knuth multiplicative mix
   * ((|id| mod 1000003)·2654435761 mod 2³², the golden-ratio constant)
   * taken mod 100 — plain OVERFLOW-FREE integer arithmetic (the pre-mod by
   * a prime keeps the product ≤ ~2.7e15, far under Long range, so engines
   * that error on BIGINT overflow — DuckDB — and engines that wrap —
   * Spark — compute the identical split for ANY id, including billions-
   * scale); swap in xxhash64 when portability of the exact assignment
   * doesn't matter. 100 TB shape: pure map stage.
   */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percentages must leave room for a test slice")
    val bucket =
      (((abs(col(idCol)) % lit(1000003L)) * lit(2654435761L)) % lit(4294967296L)) % lit(100)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
