package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality audits — the table-health checks a production ingest runs
 * before promoting a snapshot: referential integrity across tables and
 * per-column profiling within one. Companions to [[Dedup.snapshotDiff]]
 * (cross-snapshot drift) and the schema canary (dtype drift); the
 * reference leaves relational health entirely to downstream consumers
 * (reference: host-go/engine/pipes/fromSource.go:37-56).
 */
object Audit {

  /**
   * Referential-integrity audit for one FK relationship: one row
   * `(relationship, n_child_rows, n_orphan_rows, n_orphan_keys)` where an
   * orphan is a child row whose `childKey` matches no `parentKey`
   * (NULL child keys count as orphans — a NULL FK joins nothing; both
   * engines agree). Green = orphan counts 0; a nonzero row names the
   * broken edge before a downstream join silently drops rows.
   *
   * 100 TB shape: both sides reduce to key-only scan projections; the
   * parent side dedups to distinct keys before the left-anti probe, so
   * the exchange carries 8 B/key per side. The audit aggregates are
   * partial (two 1-row frames cross-joined at the driver).
   */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      relationship: String): DataFrame = {
    val ck = child.select(col(childKey).as("__k"))
    val orphans = ck.join(
      parent.select(col(parentKey).as("__k")).distinct(), Seq("__k"), "left_anti")
    val tot = ck.agg(count(lit(1)).as("n_child_rows"))
    val orp = orphans.agg(
      count(lit(1)).as("n_orphan_rows"),
      count_distinct(col("__k")).as("n_orphan_keys"))
    tot.crossJoin(orp).select(
      lit(relationship).as("relationship"),
      col("n_child_rows"), col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /**
   * Equi-width histogram per group — the distribution-shape companion to
   * the exact quantile report (quantiles give cut points; this gives the
   * full shape for a dashboard/datasheet). Integer-exact end to end:
   * values quantize to `⌊x·scale⌋`, per-group [lo, hi] bounds come from
   * one aggregate, and the bucket index is
   * `((v − lo) · nBuckets) div (hi − lo + 1)` — all operands
   * non-negative, so Spark's truncating DIV and DuckDB's flooring `//`
   * agree; the +1 keeps `v = hi` inside bucket nBuckets−1 with no
   * FP-edge clamp. Output per (group, bucket): count and the bucket's
   * observed [lo_milli, hi_milli].
   *
   * 100 TB shape: one partial-aggregated bounds pass (#groups × 16 B)
   * broadcast back; the bucket index is a map-side projection; the
   * histogram aggregate is partial (shuffle carries groups × nBuckets
   * rows). Rows never shuffle.
   */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
      nBuckets: Int, scale: Long = 1000L): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val withV = df.select(col(groupCol),
      floor(col(valueCol) * lit(scale)).cast("long").as("__v"))
    val bounds = withV.groupBy(col(groupCol))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    withV.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bucket",
        expr(s"((__v - __lo) * $nBuckets) div (__hi - __lo + 1)"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("lo_milli"), max(col("__v")).as("hi_milli"))
  }

  /**
   * Per-column table profile: one row per column —
   * `(column_name, n_rows, n_nulls, n_distinct)` — the datasheet a
   * snapshot publishes (and the base for expectation checks: uniqueness
   * = n_distinct == n_rows − n_nulls, completeness = n_nulls == 0).
   *
   * 100 TB shape: ONE aggregation pass, but k exact `count(distinct)`s
   * plan through Spark's Expand (k+1× row multiplication before the
   * partial agg) — exact is right for the oracle-checked audit; at
   * corpus scale swap `count_distinct` for `approx_count_distinct`
   * (HLL++, the certified-sketch discipline of `dedup_approx_verify`)
   * and the pass is single-width again. Null counting is
   * `sum(isNull)` — never `count(col)` subtraction, so the row stays
   * self-explanatory.
   */
  def tableProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one column to profile")
    val aggs = columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      count_distinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(columns.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").cast("long").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("r"))
      .select("r.*")
  }
}
