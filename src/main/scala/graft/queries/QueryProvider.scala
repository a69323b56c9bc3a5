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

/** Per-sf scratch directories under /tmp for side-effecting IO queries. */
object Scratch {
  def dir(sfDir: String, leaf: String): String =
    s"/tmp/graft_io/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/$leaf"

  private val materialized =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write `df` to parquet at `dir(sfDir, leaf)` once per (session, path)
   *  and return the path — the ingest-time-artifact discipline
   *  `DedupQueries.ensureClusterMap` uses (memo key recorded only after a
   *  successful write, so a failed build retries instead of poisoning
   *  later calls). Cross-engine oracle queries materialize their
   *  engine-computed inputs (signatures, codes, buckets) through this so
   *  DuckDB re-verifies downstream math over the EXACT bytes Spark
   *  consumed. */
  def materialize(s: SparkSession, sfDir: String, leaf: String,
      df: => DataFrame): String = materialized.synchronized {
    val path = dir(sfDir, leaf)
    val key = s"${s.sparkContext.applicationId}:$path"
    if (!materialized.contains(key)) {
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
      materialized.add(key)
    }
    path
  }

  /** The scratch path the DRIVER's DuckDB oracle must read: oracle SQL is
   *  a static string and the driver runs oracles at sf0.01 only
   *  (CLAUDE.md contract), so companion oracles embed this path. Computed
   *  through [[dir]] so the two sides cannot drift. */
  def oraclePath(leaf: String): String = dir("/root/testdata/sf0.01", leaf)
}

/** Testdata table loader (tables documented in /root/repo/TESTDATA.md). */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright; read it as a long (nanos since epoch).
      // Ordering/comparison semantics are identical to the ns-precision
      // timestamp DuckDB sees, with zero truncation risk. Convert with
      // timestamp_micros(ts / 1000) where a real timestamp is needed —
      // never emit it raw in an oracle-checked query.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
