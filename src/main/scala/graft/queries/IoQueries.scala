package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Source/sink format coverage beyond parquet (the reference has no format
 * scans at all — SURVEY.md §2.1 "absent" row; Spark's native readers are
 * the implementation). Each query round-trips a table through a text
 * format with an explicit read schema — schema-on-read, quoting, and type
 * fidelity are what's being checked; the oracle is the original table.
 */
object IoQueries extends QueryProvider {

  /** region through CSV (header, explicit schema on read). */
  private def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "region_csv")
    T(s, dir, "region").write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
    s.read.schema("r_regionkey BIGINT, r_name STRING")
      .option("header", "true").csv(path)
  }

  private val csvSql = "SELECT r_regionkey, r_name FROM region"

  /** nation through JSON lines (explicit schema on read). */
  private def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "nation_json")
    T(s, dir, "nation").write.mode(SaveMode.Overwrite).json(path)
    s.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .json(path)
      .select("n_nationkey", "n_name", "n_regionkey")
  }

  private val jsonSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_csv_roundtrip"  -> (csvRoundtrip _),
    "io_json_roundtrip" -> (jsonRoundtrip _)
  )

  override val oracles: Map[String, String] = Map(
    "io_csv_roundtrip"  -> csvSql,
    "io_json_roundtrip" -> jsonSql
  )
}
