package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Physical-layout operators: bucketed co-located joins and deterministic
 * per-group sampling — the storage-side levers a 100 TB deployment leans
 * on (pre-bucketed fact tables turn every repeated key-join into a
 * zero-shuffle merge; hash-order sampling gives reproducible subsets with
 * no RNG state).
 */
object StorageQueries extends QueryProvider {

  /**
   * Bucket both join sides by the key into external tables, then join —
   * with matching bucket counts Spark plans a SortMergeJoin with NO
   * Exchange on either side (verified in StorageSpec via the physical
   * plan). This is the "co-locate joins via bucketing" pattern: at scale
   * the bucketed write happens once, every later join skips its shuffle.
   */
  private val bucketedBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /**
   * One-time bucketed-table build per (session, sf dir) — the write is
   * setup (at scale it happens once per ingest), so benchmarks call this
   * from the untimed warmup and the timed query measures only the
   * zero-Exchange join.
   */
  def ensureBucketedTables(s: SparkSession, dir: String): Unit =
    // Serialized, and the memo key is recorded only AFTER a successful
    // build: a failed or interrupted build retries on the next call
    // instead of poisoning every later io_bucketed_join in the JVM.
    bucketedBuilt.synchronized {
      val base = Scratch.dir(dir, "bucketed")
      val key = s"${s.sparkContext.applicationId}:$base"
      if (bucketedBuilt.contains(key)) return
      val cat = s.catalog
      Seq("g_orders_b", "g_customer_b").foreach { t =>
        if (cat.tableExists(t)) s.sql(s"DROP TABLE $t")
      }
      T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders_b").mode(SaveMode.Overwrite)
        .saveAsTable("g_orders_b")
      T(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer_b").mode(SaveMode.Overwrite)
        .saveAsTable("g_customer_b")
      bucketedBuilt.add(key)
    }

  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketedTables(s, dir)
    s.table("g_orders_b")
      .join(s.table("g_customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * lit(100)).cast("long")) / lit(100.0))
          .as("total_price"))
  }

  private val bucketedJoinSql =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
      |    AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /**
   * Deterministic per-group sampling: keep the k rows with the smallest
   * xxhash64(id, salt) per group — a uniform-ish, seedable, RNG-free
   * sample that is stable across runs and engines that share the hash.
   * The emitted per-group count is oracle-exact; membership is
   * hash-defined (spec-checked for determinism).
   */
  private def samplePerGroup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.perGroup(T(s, dir, "documents"),
        "source", "doc_id", k = 5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("doc_id")).as("n_distinct"))

  private val samplePerGroupSql =
    """SELECT source,
      |  least(5, COUNT(*)) AS n_sampled,
      |  least(5, COUNT(*)) AS n_distinct
      |FROM documents GROUP BY source""".stripMargin

  /** Deterministic train/val/test split (see Sampling.hashSplit): the
   *  bucket arithmetic is plain integer math, so the oracle computes the
   *  IDENTICAL per-row assignment — membership itself is checked, not
   *  just slice sizes. */
  private def splitAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.hashSplit(T(s, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("split"))

  private val splitAssignSql =
    """SELECT doc_id,
      |  CASE
      |    WHEN (((abs(doc_id) % 1000003) * 2654435761) % 4294967296) % 100 < 90 THEN 'train'
      |    WHEN (((abs(doc_id) % 1000003) * 2654435761) % 4294967296) % 100 < 95 THEN 'val'
      |    ELSE 'test'
      |  END AS split
      |FROM documents""".stripMargin

  /** Deterministic global training order (Sampling.shuffleOrder): the
   *  md5-keyed permutation is portable, so the oracle checks the EXACT
   *  per-row position, not just that positions are a permutation. */
  private def shuffleOrder(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.shuffleOrder(T(s, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("train_pos"))

  private val shuffleOrderSql =
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
      |    AS BIGINT) AS train_pos
      |FROM documents""".stripMargin

  /** Z-order layout over (o_custkey, o_totalprice): the DuckDB oracle
   *  replays the rank spaces and the five-step Morton spread as a CTE
   *  chain with the same decimal mask literals, so the hash certifies
   *  the full bit-interleave, not just that positions permute. */
  private def zorderLayout(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.zorderLayout(
      T(s, dir, "orders"), "o_orderkey", "o_custkey", "o_totalprice")

  private val zorderLayoutSql: String = {
    def spreadCtes(tag: String, orderBy: String): String = {
      val base = s"""${tag}0 AS (SELECT o_orderkey AS id,
         |  ((CAST(row_number() OVER (ORDER BY $orderBy, o_orderkey) AS BIGINT) - 1)
         |    & 4294967295) AS x FROM orders)""".stripMargin
      val steps = graft.operators.Layout.spreadSteps.zipWithIndex.map {
        case ((sh, m), i) =>
          s"${tag}${i + 1} AS (SELECT id, ((x | (x << $sh)) & $m) AS x FROM $tag$i)"
      }
      (base +: steps).mkString(",\n")
    }
    s"""WITH
       |${spreadCtes("ra", "o_custkey")},
       |${spreadCtes("rb", "o_totalprice")},
       |z AS (SELECT ra5.id, (ra5.x | (rb5.x << 1)) AS zval
       |  FROM ra5 JOIN rb5 ON ra5.id = rb5.id)
       |SELECT id AS o_orderkey, zval,
       |  CAST(row_number() OVER (ORDER BY zval, id) AS BIGINT) AS pos
       |FROM z""".stripMargin
  }

  /**
   * Hive-style partitioned layout + partition pruning — the OTHER
   * storage-side read lever next to bucketing: write the corpus
   * partitioned by a low-cardinality column (here `lang`), and a
   * language-sliced read touches only that partition's files. The write
   * is one-time setup (same discipline as the bucketed tables); the
   * query measures the pruned scan. StorageSpec asserts the physical
   * plan carries the lang predicate as a PartitionFilter — the scan
   * never opens the other partitions' files. At 100 TB this is the
   * difference between reading one language's slice and the whole
   * corpus for every per-language pipeline run.
   */
  private val partitionedBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensurePartitionedTable(s: SparkSession, dir: String): String =
    partitionedBuilt.synchronized {
      val path = Scratch.dir(dir, "docs_by_lang")
      val key = s"${s.sparkContext.applicationId}:$path"
      if (!partitionedBuilt.contains(key)) {
        T(s, dir, "documents")
          .write.partitionBy("lang").mode(SaveMode.Overwrite).parquet(path)
        partitionedBuilt.add(key)
      }
      path
    }

  private def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    val path = ensurePartitionedTable(s, dir)
    s.read.parquet(path)
      .where(col("lang") === "de")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
  }

  private val partitionedScanSql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM documents WHERE lang = 'de' GROUP BY source""".stripMargin

  /**
   * Exact join-size prediction WITHOUT running the join — the
   * planning-side companion of `q_key_skew`: |A ⨝ B| on a key equals
   * Σ_k n_A(k)·n_B(k) over the two per-key count tables, so the
   * estimate costs two partial-aggregated counts plus a count-table
   * join (key-cardinality rows, never fact volume). The number a
   * capacity plan needs before committing executors to a fact-fact
   * shuffle; emitted alongside both input sizes so the blow-up factor
   * reads off directly. DECIMAL(38,0) accumulation, BIGINT out.
   */
  private def joinSizeQ(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders").groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("na"))
    val l = T(s, dir, "lineitem").groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("nb"))
    o.join(l, "k")
      .agg(sum((col("na").cast("decimal(38,0)") * col("nb")))
        .cast("long").as("join_rows"),
        sum(col("na")).as("left_keyed_rows"),
        sum(col("nb")).as("right_keyed_rows"))
  }

  private val joinSizeSql =
    """WITH a AS (
      |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na
      |  FROM orders GROUP BY 1
      |), b AS (
      |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT CAST(sum(na::HUGEINT * nb) AS BIGINT) AS join_rows,
      |  CAST(sum(na) AS BIGINT) AS left_keyed_rows,
      |  CAST(sum(nb) AS BIGINT) AS right_keyed_rows
      |FROM a JOIN b USING (k)""".stripMargin

  /** Key-skew profile of the event log's user_id — top-20 keys + global
   *  concentration (Sampling.keySkew), the pre-join audit that decides
   *  between AQE skew-split and an explicit salt. */
  private def keySkewQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.keySkew(T(s, dir, "events"), "user_id", k = 20)

  private val keySkewSql =
    """WITH c AS (
      |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1
      |), t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(n) AS BIGINT) AS n_rows,
      |    CAST(sum(n::HUGEINT * n) AS BIGINT) AS hhi
      |  FROM c
      |)
      |SELECT key, n, n_keys, n_rows, hhi
      |FROM (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 20)
      |CROSS JOIN t""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_partitioned_scan" -> (partitionedScan _),
    "q_key_skew"         -> (keySkewQ _),
    "q_join_size"        -> (joinSizeQ _),
    "io_bucketed_join"   -> (bucketedJoin _),
    "q_sample_per_group" -> (samplePerGroup _),
    "q_split_assign"     -> (splitAssign _),
    "q_shuffle_order"    -> (shuffleOrder _),
    "q_zorder_layout"    -> (zorderLayout _)
  )

  override val oracles: Map[String, String] = Map(
    "io_partitioned_scan" -> partitionedScanSql,
    "q_key_skew"         -> keySkewSql,
    "q_join_size"        -> joinSizeSql,
    "io_bucketed_join"   -> bucketedJoinSql,
    "q_sample_per_group" -> samplePerGroupSql,
    "q_split_assign"     -> splitAssignSql,
    "q_shuffle_order"    -> shuffleOrderSql,
    "q_zorder_layout"    -> zorderLayoutSql
  )
}
