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
}
