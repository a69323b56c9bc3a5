package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCD-Type-2 interval builder — the history-keeping sibling of
 * `q_latest_by_key`'s CDC upsert: from an append-only change log, emit
 * one row per (key, version) where a version is a maximal run of
 * CONSECUTIVE events (in (ts, id) order) carrying the same tracked
 * attribute, with `[valid_from_us, valid_to_us)` half-open validity
 * (`valid_to_us` NULL for each key's current version). The dimension
 * table a warehouse joins facts against "as of" a timestamp.
 *
 * NULL attribute values are first-class: run comparison is null-safe
 * (`<=>`), so a NULL attr opens/continues its OWN version run (emitted
 * with attr = NULL) rather than merging into a neighbor. (ts, id) is a
 * total order so version boundaries are deterministic and a DuckDB
 * oracle replays lag → running-sum → group → lead move-for-move.
 *
 * 100 TB shape: rows slim to (key, ts, id, attr) before the ONE
 * key-hash exchange; the change-flag window, running version sum,
 * per-version aggregate and the lead() stitching all share the same
 * key-prefixed partitioning. Per-key window memory is a single row of
 * lag state — never the key's whole history.
 */
object Scd {

  def intervals(df: DataFrame, keyCol: String, tsUsCol: String,
      attrCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    val marked = df.select(col(keyCol), col(tsUsCol), col(idCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // Null-safe change flag: a NULL attr is a value of its own — it
      // starts/continues its OWN version run instead of silently merging
      // into the previous version (`<=>` treats NULL <=> NULL as equal).
      // A NULL-attr version surfaces with attr = NULL (min over all-NULL).
      // First row per key: __lagged distinguishes "no previous row" from
      // "previous attr was NULL", so a leading NULL run still opens at 1.
      .withColumn("__lagged", lag(lit(1L), 1).over(w))
      .withColumn("__chg",
        when(col("__lagged").isNull || !(col("__prev") <=> col(attrCol)), 1L)
          .otherwise(0L))
      .withColumn("__ver", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = marked.groupBy(col(keyCol), col("__ver"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsUsCol)).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    versions
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("__ver"))))
      .select(col(keyCol), col(attrCol), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
  }
}
