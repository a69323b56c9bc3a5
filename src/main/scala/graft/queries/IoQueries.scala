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

  /** customer through ORC — the columnar format besides parquet a lake
   *  actually serves; type fidelity is native (no schema-on-read). */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "customer_orc")
    T(s, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
  }

  private val orcSql =
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer"

  /** document text through line-oriented text files (the raw-corpus
   *  ingest shape: one document per line, schema = a single string
   *  column). Valid because the synthetic texts carry no newlines; a real
   *  pipeline would JSONL-frame instead (io_json_roundtrip). */
  private def textRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "documents_text")
    T(s, dir, "documents").select(col("text").as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    s.read.text(path)
  }

  private val textSql = "SELECT text AS value FROM documents"

  /** Documents through GZIP-compressed JSON lines — the shape a raw web
   *  corpus actually arrives in (WET/JSONL.gz dumps). Write-side codec
   *  is explicit; read-side decompression is extension-dispatched by
   *  Spark's datasource layer. 100 TB note: .gz is NOT splittable — one
   *  file = one task — so ingest jobs shard the corpus into many
   *  files (here: the write's natural partitioning) and re-frame to
   *  parquet/zstd immediately; this query certifies the ingest hop. */
  private def gzipJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "documents_jsonl_gz")
    T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      .write.mode(SaveMode.Overwrite).option("compression", "gzip")
      .json(path)
    s.read.schema("doc_id BIGINT, lang STRING, text STRING").json(path)
      .select("doc_id", "lang", "text")
  }

  private val gzipJsonSql = "SELECT doc_id, lang, text FROM documents"

  /**
   * Schema evolution across ingest batches: an early batch without a
   * column and a later batch with it land in the same dataset;
   * `mergeSchema` reads the union schema and back-fills nulls — the
   * snapshot-over-snapshot reality of a growing corpus (new metadata
   * columns appear mid-history and old files must stay readable). The
   * per-lang aggregate counts total docs and docs carrying the new
   * column, so the hash certifies both the union schema and the
   * null back-fill.
   */
  private def schemaMerge(s: SparkSession, dir: String): DataFrame = {
    val path = Scratch.dir(dir, "docs_schema_merge")
    val docs = T(s, dir, "documents")
    docs.where(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/b1")
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("source"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/b2")
    s.read.option("mergeSchema", "true").parquet(s"$path/b1", s"$path/b2")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("source")).as("n_with_source"))
  }

  private val schemaMergeSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(CASE WHEN doc_id % 2 = 1 THEN source END) AS BIGINT)
      |    AS n_with_source
      |FROM documents GROUP BY 1""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_schema_merge"   -> (schemaMerge _),
    "io_csv_roundtrip"  -> (csvRoundtrip _),
    "io_json_roundtrip" -> (jsonRoundtrip _),
    "io_orc_roundtrip"  -> (orcRoundtrip _),
    "io_gzip_jsonl"     -> (gzipJsonRoundtrip _),
    "io_text_roundtrip" -> (textRoundtrip _)
  )

  override val oracles: Map[String, String] = Map(
    "io_schema_merge"   -> schemaMergeSql,
    "io_csv_roundtrip"  -> csvSql,
    "io_json_roundtrip" -> jsonSql,
    "io_orc_roundtrip"  -> orcSql,
    "io_gzip_jsonl"     -> gzipJsonSql,
    "io_text_roundtrip" -> textSql
  )
}
