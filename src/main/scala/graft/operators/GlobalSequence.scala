package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Scalable global 1-based sequence — the Spark-native form of the
 * reference's stateful `counter` lens
 * (reference: tests/modules/rust_wasm32_counter/src/lib.rs:26-54), which is
 * well-defined there only because execution is single-threaded pull
 * (reference: host-go/cli/main.go:36-53).
 *
 * A naive `row_number().over(Window.orderBy(key))` funnels every row
 * through ONE partition — unacceptable at 100 TB. Instead:
 *
 *   1. range-partition + sort by the ordering key (what a global sort does);
 *   2. `row_number` *within* each partition (no extra shuffle — data is
 *      already clustered);
 *   3. count rows per partition (tiny aggregate: one row per partition),
 *      prefix-sum the counts on the driver, and broadcast-join the offsets
 *      back.
 *
 * Two passes over the data, but every stage is fully parallel. For the
 * one-pass, non-contiguous variant use `uniqueId` (monotonically increasing
 * id), which is the preferred op when only uniqueness matters.
 */
object GlobalSequence {

  /** Deterministic contiguous 1-based ids ordered by `key` (total order
   *  required for exact determinism — use a unique key).
   *
   *  Implementation note: this must be ONE lineage. Building the offsets
   *  with a separate `groupBy(partitionId).count` job re-executes the
   *  range exchange, and `repartitionByRange`'s bound-sampling is seeded
   *  by RDD id — a fresh execution samples different bounds, so the
   *  offsets would describe a different partitioning than the final job
   *  (observed: overlapping id ranges at sf0.1). `zipWithIndex` runs its
   *  count pass and its attach pass over the SAME shuffled RDD, so the
   *  exchange executes once and both passes see identical partitions. */
  def withSequentialId(df: DataFrame, key: Column, as: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, key).sortWithinPartitions(key)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(as,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }

  /** One-pass unique (non-contiguous) id — scale-preferred when only
   *  uniqueness matters. */
  def withUniqueId(df: DataFrame, as: String): DataFrame =
    df.withColumn(as, monotonically_increasing_id())
}
