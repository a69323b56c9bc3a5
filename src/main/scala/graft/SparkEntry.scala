package graft

import graft.queries._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def providers: Seq[QueryProvider] = Seq(
    LensQueries,
    RelationalQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    WebQueries,
    MultimodalQueries,
    SessionQueries,
    AnomalyQueries,
    AuditQueries,
    IoQueries,
    StorageQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   *  A lens pipeline (filter + computed column) feeding a revenue
   *  aggregation — engine + Spark built-ins in one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = T(spark, dir, "lineitem")
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:filter","arguments":{"expr":"l_quantity > 0"}},
        |  {"path":"builtin:with_column","arguments":
        |    {"col":"revenue","expr":"l_extendedprice * (1 - l_discount)"}}
        |]}""".stripMargin)
    pipe.forward(li)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("revenue")).as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    providers.flatMap(_.queries).toMap

  /** Everything [[graft.Bench]] times: the correctness surface plus the
   *  bench-only production shapes (see [[graft.queries.QueryProvider.benchOnly]]
   *  — each certified by a `*_verify` row in [[queries]]). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    providers.flatMap(p => p.queries ++ p.benchOnly).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    providers.flatMap(_.oracles).toMap
}
