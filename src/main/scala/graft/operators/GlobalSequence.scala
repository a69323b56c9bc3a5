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

  private val PID = "__graft_pid"
  private val LRN = "__graft_lrn"
  private val OFF = "__graft_off"

  /** Deterministic contiguous 1-based ids ordered by `key` (total order
   *  required for exact determinism — use a unique key). */
  def withSequentialId(df: DataFrame, key: Column, as: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, key)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(Window.partitionBy(col(PID)).orderBy(key)))
    // One row per partition — trivially small whatever the data size.
    val counts = ranged.groupBy(col(PID)).agg(count(lit(1)).cast("long").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, cnt)) => (pid, acc + cnt) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF(PID, OFF)
    ranged
      .join(broadcast(offsetsDf), PID)
      .withColumn(as, (col(LRN).cast("long") + col(OFF)))
      .drop(PID, LRN, OFF)
  }

  /** One-pass unique (non-contiguous) id — scale-preferred when only
   *  uniqueness matters. */
  def withUniqueId(df: DataFrame, as: String): DataFrame =
    df.withColumn(as, monotonically_increasing_id())
}
