package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One domain's contribution to SparkEntry.queries / oracleSql. */
trait QueryProvider {
  /** name -> (spark, sfDir) => result. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** name -> equivalent DuckDB SQL over the same parquet tables. Entries
   *  may be omitted for non-SQL-expressible ops (driver then records a
   *  weaker rows-only check). */
  def oracles: Map[String, String]
}

/** Testdata table loader (tables documented in /root/repo/TESTDATA.md). */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
