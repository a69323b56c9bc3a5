package graft.queries

import graft.operators.Audit
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Data-quality audit queries — the table-health checks an ingest runs
 * before promoting a snapshot ([[graft.operators.Audit]]): referential
 * integrity across the TPC-H-ish FK edges and a per-column profile of
 * `orders`. Green audits are the normal output (the testdata is clean);
 * the oracle certifies the MACHINERY — a broken edge or a null burst
 * would surface as nonzero counts on both engines identically.
 */
object AuditQueries extends QueryProvider {

  /** The four FK edges of the testdata star schema. */
  private def fkAuditQ(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = T(s, dir, n)
    Audit.fkOrphans(t("lineitem"), "l_orderkey", t("orders"), "o_orderkey",
        "lineitem->orders")
      .unionByName(Audit.fkOrphans(t("lineitem"), "l_partkey",
        t("part"), "p_partkey", "lineitem->part"))
      .unionByName(Audit.fkOrphans(t("lineitem"), "l_suppkey",
        t("supplier"), "s_suppkey", "lineitem->supplier"))
      .unionByName(Audit.fkOrphans(t("orders"), "o_custkey",
        t("customer"), "c_custkey", "orders->customer"))
  }

  private def fkEdgeSql(rel: String, child: String, ck: String,
      parent: String, pk: String): String =
    s"""SELECT '$rel' AS relationship,
       |  (SELECT count(*) FROM $child) AS n_child_rows,
       |  count(*) AS n_orphan_rows,
       |  count(DISTINCT c.$ck) AS n_orphan_keys
       |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
       |  ON c.$ck = p.$pk
       |WHERE p.$pk IS NULL""".stripMargin

  private val fkAuditSql = Seq(
    fkEdgeSql("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    fkEdgeSql("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    fkEdgeSql("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    fkEdgeSql("orders->customer", "orders", "o_custkey", "customer", "c_custkey")
  ).mkString("", "\nUNION ALL\n", "")

  private val OrdersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private def tableAuditQ(s: SparkSession, dir: String): DataFrame =
    Audit.tableProfile(T(s, dir, "orders"), OrdersCols)

  private val tableAuditSql = OrdersCols.map(c =>
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct
       |FROM orders""".stripMargin
  ).mkString("", "\nUNION ALL\n", "")

  /** Distribution shape of order totals per status: 16 equi-width
   *  buckets, integer-exact bounds + bucket arithmetic (DIV ≡ // on the
   *  non-negative operands). */
  private def histogramQ(s: SparkSession, dir: String): DataFrame =
    Audit.histogram(T(s, dir, "orders"), "o_totalprice", "o_orderstatus",
      nBuckets = 16, scale = 1000L)

  private val histogramSql =
    """WITH v AS (
      |  SELECT o_orderstatus,
      |    CAST(floor(o_totalprice * 1000) AS BIGINT) AS vm
      |  FROM orders
      |), b AS (
      |  SELECT o_orderstatus, min(vm) AS lo, max(vm) AS hi
      |  FROM v GROUP BY 1
      |)
      |SELECT v.o_orderstatus,
      |  ((v.vm - b.lo) * 16) // (b.hi - b.lo + 1) AS bucket,
      |  count(*) AS n, min(v.vm) AS lo_milli, max(v.vm) AS hi_milli
      |FROM v JOIN b USING (o_orderstatus)
      |GROUP BY 1, 2""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fk_audit"    -> (fkAuditQ _),
    "q_table_audit" -> (tableAuditQ _),
    "q_histogram"   -> (histogramQ _)
  )

  override val oracles: Map[String, String] = Map(
    "q_fk_audit"    -> fkAuditSql,
    "q_table_audit" -> tableAuditSql,
    "q_histogram"   -> histogramSql
  )
}
