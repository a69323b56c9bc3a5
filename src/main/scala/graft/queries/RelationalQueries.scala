package graft.queries

import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * The relational operator surface the reference deliberately lacks
 * (SURVEY.md §2.5 — joins, aggregations, windows, sorts, set ops, scalar
 * functions, subqueries), supplied by Spark built-ins and exposed as lens
 * ops. Every query is written for scale first: dimension joins broadcast,
 * fact-fact joins shuffle on their keys, windows partition by real keys
 * (never a global single-partition window), and every predicate/projection
 * is Column-based so Catalyst pushes it into the parquet scan.
 *
 * Oracle-parity rules (see .claude/skills/verify/SKILL.md): FP sums go
 * through DECIMAL on both sides then cast to DOUBLE; integer-returning
 * Spark functions are cast to long (DuckDB returns int64/hugeint);
 * timestamps are never emitted at raw precision.
 */
object RelationalQueries extends QueryProvider {

  /** Bit-deterministic money sum. Decimal paths are NOT portable across
   *  engines (DuckDB rescales half-to-even, Spark half-up; decimal→double
   *  above 2^53 differs by 1 ulp), so sum integer cents instead:
   *  x*100 (IEEE multiply, identical), floor (exact), BIGINT sum (exact),
   *  int64→double (correctly rounded on both), /100.0 (IEEE). */
  private def dsum(c: Column): Column =
    (sum(floor(c * lit(100)).cast("long")) / lit(100.0))
  private val DSUM = "CAST(SUM(CAST(floor(%s * 100) AS BIGINT)) AS BIGINT) / 100.0"

  // ---- Aggregation ---------------------------------------------------

  // TPC-H Q1 shape: the canonical partial-agg (map-side combine) pattern —
  // one shuffle of |groups| rows, not |rows|.
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // revenue in exact integer micro-units: cents(price) × bp(1-disc)
        (sum(floor(col("l_extendedprice") * lit(100)).cast("long") *
             floor((lit(1.0) - col("l_discount")) * lit(10000)).cast("long"))
          / lit(1e6)).as("sum_disc_price"),
        (sum(col("l_quantity").cast("long")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  private val q1AggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |  ${DSUM.format("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT) *
       |           CAST(floor((1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
       |    / 1e6 AS sum_disc_price,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // Exact + distinct aggregates. (approx_count_distinct is covered without
  // an oracle in DedupQueries — HLL sketches differ across engines.)
  private def aggDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum(col("l_orderkey")).as("sum_keys"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  private val aggDistinctSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // Variance/stddev from exact integer moments — bit-deterministic (a
  // parallel stddev_samp would differ from DuckDB's in the last ulp).
  private def aggStats(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("l_quantity").cast("long") * col("l_quantity").cast("long"))
          .as("sum_qty_sq"))
      .withColumn("variance",
        (col("sum_qty_sq") - col("sum_qty") * col("sum_qty") / col("n").cast("double")) /
          (col("n") - 1))
      .withColumn("stddev", sqrt(col("variance")))

  private val aggStatsSql =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
      |      AS sum_qty_sq
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n, sum_qty, sum_qty_sq,
      |  (sum_qty_sq - sum_qty * sum_qty / CAST(n AS DOUBLE)) / (n - 1) AS variance,
      |  sqrt((sum_qty_sq - sum_qty * sum_qty / CAST(n AS DOUBLE)) / (n - 1)) AS stddev
      |FROM m""".stripMargin

  // min_by/max_by (deterministic: selector key is unique).
  private def aggArgmax(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), col("o_orderkey")).as("last_key"),
        min_by(col("o_orderpriority"), col("o_orderkey")).as("first_priority"))

  private val aggArgmaxSql =
    """SELECT o_orderstatus,
      |  arg_max(o_orderkey, o_orderkey) AS last_key,
      |  arg_min(o_orderpriority, o_orderkey) AS first_priority
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // ROLLUP — grouping-set nulls coalesced to 'ALL' so the compare never
  // sorts nulls.
  private def rollup(s: SparkSession, dir: String): DataFrame = {
    val n = T(s, dir, "nation"); val r = T(s, dir, "region")
    val c = T(s, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_bal"))
  }

  private val rollupSql =
    s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       |  COUNT(*) AS n_customers, ${DSUM.format("c_acctbal")} AS sum_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  private def cube(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"))

  private val cubeSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "events").createOrReplaceTempView("events")
    s.sql(
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_bucket,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())""".stripMargin)
  }

  private val groupingSetsSql =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())""".stripMargin

  // ---- Joins ---------------------------------------------------------

  // Dimension join: explicit broadcast — zero shuffle of the fact side.
  private def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val c = T(s, dir, "customer"); val o = T(s, dir, "orders")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  private val joinBroadcastSql =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  ${DSUM.format("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  /** TPC-H-Q5-shaped 6-table star join: region→nation→customer ⨝
   *  orders ⨝ lineitem ⨝ supplier with the local-supplier condition
   *  (`s_nationkey = c_nationkey`), one year of orders, revenue per
   *  nation. THE join-planning benchmark shape: the three dimension
   *  sides broadcast (region/nation prune customers map-side before
   *  any fact shuffle; supplier rides the lineitem scan), the date
   *  filter pushes to the orders scan, and only the two fact tables
   *  exchange — on their join keys, once each. Revenue is
   *  integer-cents (`floor(price·(1−disc)·100)` per ROW, then summed)
   *  so the aggregate is exact under any partitioning; the oracle
   *  mirrors the expression shape exactly. */
  private def starJoin(s: SparkSession, dir: String): DataFrame = {
    val reg = T(s, dir, "region").where(col("r_name") === "ASIA")
    val nat = T(s, dir, "nation")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = T(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = T(s, dir, "orders")
      .where(expr("o_orderdate >= timestamp'1996-01-01' AND " +
        "o_orderdate < timestamp'1997-01-01'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val sup = T(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(expr(
          "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  private val starJoinSql =
    """SELECT n_name,
      |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
      |    AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  // Fact-fact join: shuffles both sides on the join key (AQE picks
  // SMJ/shuffled-hash at scale; broadcasts when a side turns out tiny).
  private def joinShuffle(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem"); val o = T(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        (sum(floor(col("l_extendedprice") * lit(100)).cast("long") *
             floor((lit(1.0) - col("l_discount")) * lit(10000)).cast("long"))
          / lit(1e6)).as("revenue"))
  }

  private val joinShuffleSql =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT) *
      |           CAST(floor((1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
      |    / 1e6 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // Skew-salted shuffle join (SkewJoin.saltedInner): probe rows scatter
  // over salt buckets, the slim build side replicates — and the result
  // multiset is EXACTLY the plain join's, which is what the UNsalted
  // oracle SQL verifies by hash.
  private def joinSkew(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val o = T(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedInner(li, o, Seq("l_orderkey"), saltBuckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(floor(col("l_quantity") * lit(100)).cast("long")).as("qty_centi"))
  }

  private val joinSkewSql =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_centi
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // Left outer + null handling.
  private def joinOuter(s: SparkSession, dir: String): DataFrame = {
    val n = T(s, dir, "nation"); val c = T(s, dir, "customer")
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
  }

  private val joinOuterSql =
    """SELECT n_name, COUNT(c_custkey) AS n_customers
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_name""".stripMargin

  // Semi/anti joins — EXISTS / NOT EXISTS without materializing the right side.
  private def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = T(s, dir, "customer"); val o = T(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  private val joinSemiSql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  private def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = T(s, dir, "customer"); val o = T(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  private val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Unpivot/melt (`stack`): wide numeric columns to long
   *  (metric, value) form — the inverse of q_pivot, the shape feature
   *  stores and metric pipelines ingest. Values carried as exact centi
   *  units (BIGINT) so the re-aggregation hashes identically; stack is
   *  a generator, so the melt is a pure scan projection feeding a
   *  partial-aggregated groupBy. */
  private def unpivotQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(expr("""stack(3,
        'o_orderkey', o_orderkey * 100,
        'o_custkey', o_custkey * 100,
        'o_totalprice', CAST(floor(o_totalprice * 100) AS BIGINT))
        AS (metric, centi)"""))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("centi")).as("sum_centi"))

  private val unpivotSql =
    """WITH u AS (
      |  SELECT 'o_orderkey' AS metric, o_orderkey * 100 AS centi FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', o_custkey * 100 FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', CAST(floor(o_totalprice * 100) AS BIGINT)
      |  FROM orders
      |)
      |SELECT metric, count(*) AS n, CAST(sum(centi) AS BIGINT) AS sum_centi
      |FROM u GROUP BY 1""".stripMargin

  /** Null-safe equi-join (`<=>` ≡ IS NOT DISTINCT FROM): both sides
   *  derive a nullable bucket key, aggregate FIRST (so the join carries
   *  ≤ 101 slim rows per side), and the NULL groups match each other —
   *  the semantics a plain `=` join silently drops. EqualNullSafe is a
   *  first-class hash-join key in Spark, so this plans as an ordinary
   *  shuffled hash/SMJ join, not a nested loop. */
  private def joinNullsafe(s: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, c: String, cnt: String) = df
      .select(when(col(c) % 10 === 0, lit(null)).otherwise(col(c) % 100)
        .as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as(cnt))
    val o = keyed(T(s, dir, "orders"), "o_custkey", "n_orders")
    val c = keyed(T(s, dir, "customer"), "c_custkey", "n_customers")
    o.join(c, o("k") <=> c("k"))
      .select(o("k").as("k"), col("n_orders"), col("n_customers"))
  }

  private val joinNullsafeSql =
    """WITH o AS (
      |  SELECT CASE WHEN o_custkey % 10 = 0 THEN NULL
      |    ELSE o_custkey % 100 END AS k, count(*) AS n_orders
      |  FROM orders GROUP BY 1
      |), c AS (
      |  SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
      |    ELSE c_custkey % 100 END AS k, count(*) AS n_customers
      |  FROM customer GROUP BY 1
      |)
      |SELECT o.k, o.n_orders, c.n_customers
      |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k""".stripMargin

  // Non-equi range join (bucket bounds are a tiny inline table — broadcast
  // nested-loop, the only sane plan).
  private def joinRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = Seq((0.0, 5.0, "low"), (5.0, 10.0, "mid"), (10.0, 100.0, "high"))
      .toDF("lo", "hi", "bucket")
    val e = T(s, dir, "events")
    e.join(broadcast(buckets), e("value") >= col("lo") && e("value") < col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  private val joinRangeSql =
    s"""SELECT bucket, COUNT(*) AS n, ${DSUM.format("value")} AS sum_value
       |FROM events JOIN (VALUES (0.0, 5.0, 'low'), (5.0, 10.0, 'mid'),
       |                         (10.0, 100.0, 'high')) AS b(lo, hi, bucket)
       |  ON value >= lo AND value < hi
       |GROUP BY bucket""".stripMargin

  // As-of join (see AsOfJoin): each event matched to the same user's most
  // recent STRICTLY earlier purchase — the attribution query.
  private def joinAsOf(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("prev_purchase_id"))
    AsOfJoin.asOf(
      e, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts",
      rightCols = Seq("prev_purchase_id"),
      strict = true)
      .select(col("event_id"), col("prev_purchase_id"))
  }

  private val joinAsOfSql =
    """SELECT e.event_id, p.event_id AS prev_purchase_id
      |FROM events e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts > p.ts""".stripMargin

  /** FORWARD as-of: first purchase strictly after each event — the
   *  next-event-attribution direction DuckDB's ASOF JOIN doesn't have
   *  (the oracle is a correlated LIMIT-1 subquery DuckDB decorrelates).
   *  Same single-shuffle union+window plan, scan direction flipped. */
  private def joinAsOfForward(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("next_purchase_id"))
    AsOfJoin.asOf(
      e, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts",
      rightCols = Seq("next_purchase_id"),
      strict = true, forward = true)
      .select(col("event_id"), col("next_purchase_id"))
  }

  private val joinAsOfForwardSql =
    """SELECT e.event_id,
      |  (SELECT p.event_id FROM events p
      |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      |     AND p.ts > e.ts
      |   ORDER BY p.ts, p.event_id LIMIT 1) AS next_purchase_id
      |FROM events e""".stripMargin

  // ---- Windows ---------------------------------------------------------

  // Rank within group (tie-safe: rank(), not row_number, over non-unique
  // ordering). Window partitions by nation — parallel, never global.
  private def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("c_nationkey"),
        rank().over(w).cast("long").as("bal_rank"),
        dense_rank().over(w).cast("long").as("bal_dense_rank"))
  }

  private val windowRankSql =
    """SELECT c_custkey, c_nationkey,
      |  CAST(rank() OVER w AS BIGINT) AS bal_rank,
      |  CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  // Running sum in integer cents: window aggregation association differs
  // between engines (DuckDB uses segment trees), exact integers don't care.
  private def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        (sum(floor(col("o_totalprice") * lit(100)).cast("long")).over(w) / lit(100.0))
          .as("running_spend"))
  }

  private val windowRunningSql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
      |    AS running_spend
      |FROM orders""".stripMargin

  // RANGE frame: events within a trailing 1-hour event-time window per
  // user — value-based frames handle timestamp ties by peer-group, so the
  // result is deterministic without a tie-break column. µs on both
  // engines (see SessionQueries for the ns-truncation contract).
  private def windowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    T(s, dir, "events")
      .withColumn("us", expr("ts div 1000"))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        (sum(floor(col("value") * lit(100)).cast("long")).over(w) / lit(100.0))
          .as("v_trailing_hour"))
  }

  private val windowRangeSql =
    """SELECT event_id,
      |  COUNT(*) OVER w AS n_trailing_hour,
      |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) / 100.0
      |    AS v_trailing_hour
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // Exact discrete percentiles (order statistics — no FP interpolation,
  // so values are actual data elements and hash-match across engines).
  private def aggPercentiles(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("q25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("q50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)").as("q95"))

  private val aggPercentilesSql =
    """SELECT l_returnflag,
      |  quantile_disc(l_quantity, 0.25) AS q25,
      |  quantile_disc(l_quantity, 0.5) AS q50,
      |  quantile_disc(l_quantity, 0.95) AS q95
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // Approximate-quantile sketch certification — the Greenwald-Khanna
  // sibling of the HLL (dedup_approx_verify), CMS (text_cms_verify) and
  // Bloom (dedup_bloom_verify) error-contract checks. Spark's
  // percentile_approx at `accuracy` guarantees the returned ELEMENT's
  // exact rank lies within ceil(n/accuracy) of ceil(p·n). The sketch
  // estimates are engine-internal → materialized to parquet; both engines
  // then recompute exact ranks from raw events over those exact bytes and
  // re-check the bound with pure integer arithmetic. 100 TB shape: the
  // sketch is one partial-aggregated pass (KB-sized per-partition
  // summaries merge on the driver side of the agg); the rank recheck is
  // one broadcast of the ≤groups×quantiles estimate table back over the
  // stream — a verify-time cost only.
  private def aggQuantileVerify(s: SparkSession, dir: String): DataFrame = {
    val ests = T(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile_approx(value, array(0.5D, 0.9D, 0.99D), 100)")
        .as("ests"))
      .select(col("event_type"), posexplode(col("ests")).as(Seq("pos", "est")))
      .withColumn("p_pct",
        element_at(array(lit(50L), lit(90L), lit(99L)), col("pos") + 1))
      .select("event_type", "p_pct", "est")
    Scratch.materialize(s, dir, "quantile_ests", ests)
    s.read.parquet(Scratch.dir(dir, "quantile_ests"))
      .join(T(s, dir, "events").select("event_type", "value"), "event_type")
      .groupBy(col("event_type"), col("p_pct"), col("est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("est"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("value") <= col("est"), 1L).otherwise(0L)).as("n_le"))
      .withColumn("target", expr("(p_pct * n + 99) div 100"))
      .withColumn("eps", expr("(n + 99) div 100"))
      .select(col("event_type"), col("p_pct"), col("est"), col("n"),
        (col("n_lt") + 1).as("rank_lo"), col("n_le").as("rank_hi"),
        col("target"), col("eps"),
        (col("n_lt") + 1 <= col("target") + col("eps") &&
          col("n_le") >= col("target") - col("eps")).as("within_bound"))
  }

  private val aggQuantileVerifySql =
    s"""WITH est AS (
       |  SELECT event_type, p_pct, est
       |  FROM read_parquet('${Scratch.oraclePath("quantile_ests")}/*.parquet')
       |), r AS (
       |  SELECT e.event_type, e.p_pct, e.est,
       |    count(*) AS n,
       |    sum(CASE WHEN v.value < e.est THEN 1 ELSE 0 END) AS n_lt,
       |    sum(CASE WHEN v.value <= e.est THEN 1 ELSE 0 END) AS n_le
       |  FROM est e JOIN events v USING (event_type)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT event_type, p_pct, est, CAST(n AS BIGINT) AS n,
       |  CAST(n_lt + 1 AS BIGINT) AS rank_lo, CAST(n_le AS BIGINT) AS rank_hi,
       |  CAST((p_pct * n + 99) // 100 AS BIGINT) AS target,
       |  CAST((n + 99) // 100 AS BIGINT) AS eps,
       |  (n_lt + 1 <= (p_pct * n + 99) // 100 + (n + 99) // 100
       |   AND n_le >= (p_pct * n + 99) // 100 - (n + 99) // 100) AS within_bound
       |FROM r""".stripMargin

  // Typed imperative aggregate top-k: bounded k-entry partial buffers
  // map-side, ≤ k·16 B per (partition × group) shuffled — vs the window
  // formulation (q_topk_per_group) that shuffles and sorts every row.
  // Output exploded to (o_custkey, pos, o_orderkey) rows — the driver's
  // comparer can't hash array cells, and flat rows oracle-check exactly.
  private def aggTopkTyped(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(org.apache.spark.sql.graft.GraftTopK
        .topKByValue(col("o_totalprice"), col("o_orderkey"), 3)
        .as("top_orders"))
      .select(col("o_custkey"),
        posexplode(col("top_orders")).as(Seq("pos", "o_orderkey")))
      .select(col("o_custkey"), col("pos").cast("long").as("pos"),
        col("o_orderkey"))

  private val aggTopkTypedSql =
    """WITH t AS (
      |  SELECT o_custkey,
      |    (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey ASC))[1:3]
      |      AS tops
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey,
      |  CAST(unnest(range(len(tops))) AS BIGINT) AS pos,
      |  unnest(tops) AS o_orderkey
      |FROM t""".stripMargin

  private def windowLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T(s, dir, "events")
      .select(col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  private val windowLagLeadSql =
    """SELECT event_id,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(event_type, 1) OVER w AS next_type
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // Top-k per group: rank ≤ k (tie-inclusive ⇒ deterministic), filter
  // early — at scale this is a partial top-k per partition, not a global sort.
  private def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T(s, dir, "orders")
      .withColumn("rk", rank().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  private val topkPerGroupSql =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(rank() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin

  // ---- Sort / limit / set ops -----------------------------------------

  // Global top-k: orderBy+limit compiles to TakeOrderedAndProject — per-
  // partition top-k then a k-row merge, no global sort shuffle.
  private def sortLimit(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  private val sortLimitSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = T(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
    val sp = T(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))
    val both = c.intersect(sp).withColumn("op", lit("intersect"))
    val onlyC = c.except(sp).withColumn("op", lit("except"))
    val all = c.union(sp).distinct().withColumn("op", lit("union"))
    both.unionByName(onlyC).unionByName(all)
  }

  private val setOpsSql =
    """SELECT nationkey, 'intersect' AS op FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'except' AS op FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'union' AS op FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   UNION SELECT s_nationkey FROM supplier)""".stripMargin

  // ---- Subqueries (Catalyst decorrelation) -----------------------------

  private def subqueries(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders) * 1.5
        |  AND o_custkey IN (SELECT o_custkey FROM orders
        |                    GROUP BY o_custkey HAVING COUNT(*) >= 2)""".stripMargin)
  }

  private val subqueriesSql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM orders) * 1.5
      |  AND o_custkey IN (SELECT o_custkey FROM orders
      |                    GROUP BY o_custkey HAVING COUNT(*) >= 2)""".stripMargin

  // ---- Scalar function library ----------------------------------------

  // Profiled (r4): 0.18 s warm median at sf0.1 — the 1.3-1.7 s single-run
  // timings that flagged this query were first-execution codegen
  // compilation, not per-row work (regexp_replace compiles its literal
  // pattern once, outside the row loop). Median-of-N benching (Bench)
  // reports the steady state; no plan change was warranted.
  private def scalarString(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        col("p_name").contains("a").as("has_a"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"))

  private val scalarStringSql =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substring(p_name, 1, 5) AS name_prefix,
      |  p_brand || '/' || p_type AS brand_type,
      |  replace(p_name, ' ', '_') AS name_snake,
      |  contains(p_name, 'a') AS has_a,
      |  lpad(p_brand, 12, '*') AS brand_padded
      |FROM part""".stripMargin

  private def scalarDate(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
        date_trunc("month", col("o_orderdate")).as("order_month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))

  private val scalarDateSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
      |  date_trunc('month', o_orderdate) AS order_month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
      |    AS days_to_2002
      |FROM orders""".stripMargin

  private def scalarMathJson(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(
        col("event_id"),
        sqrt(col("value")).as("value_sqrt"),
        floor(col("value")).cast("long").as("value_floor"),
        ceil(col("value")).cast("long").as("value_ceil"),
        abs(col("value") - lit(5.0)).as("value_dist5"),
        (col("user_id") % 7).as("user_mod"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
        when(col("event_type") === "purchase", lit("buy"))
          .when(col("event_type") === "error", lit("bad"))
          .otherwise(lit("other")).as("type_class"))

  private val scalarMathJsonSql =
    """SELECT event_id,
      |  sqrt(value) AS value_sqrt,
      |  CAST(floor(value) AS BIGINT) AS value_floor,
      |  CAST(ceil(value) AS BIGINT) AS value_ceil,
      |  abs(value - 5.0) AS value_dist5,
      |  user_id % 7 AS user_mod,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      |  CASE WHEN event_type = 'purchase' THEN 'buy'
      |       WHEN event_type = 'error' THEN 'bad'
      |       ELSE 'other' END AS type_class
      |FROM events""".stripMargin

  // Array functions (emitted as a joined string — engine-portable shape).
  private def scalarArray(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        array_join(slice(sort_array(array_distinct(split(col("text"), " "))), 1, 5), ",")
          .as("first_words"),
        array_contains(split(col("text"), " "), "data").as("mentions_data"))

  private val scalarArraySql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
      |    AS first_words,
      |  list_contains(string_split(text, ' '), 'data') AS mentions_data
      |FROM documents""".stripMargin

  // Pivot. Spark's relational pivot operator compiles to exactly this
  // conditional aggregation — one shuffle, engine-portable.
  private def pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    T(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot(col("event_type"), types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  private val pivotSql = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cols = types.map(t =>
      s"COUNT(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n  ")
    s"SELECT user_id,\n  $cols\nFROM events GROUP BY user_id"
  }

  // PageRank over the customer→supplier purchase graph (Pagerank.run):
  // suppliers are offset by 1e6 into a shared id space and are all
  // dangling (no out-edges), exercising the dangling-mass path. All
  // arithmetic is integer nano-units with integer division, so the
  // oracle replays the 5 unrolled power iterations bit-exactly.
  private val prIters = 5
  private def pagerankQ(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
    graft.operators.Pagerank.run(edges, "src", "dst", iters = prIters)
  }

  /** The unrolled Pagerank.run power-iteration CTE chain — shared with
   *  WebQueries.pipeline_host_rank so the replay arithmetic cannot
   *  drift between graphs. Expects CTEs e(src,dst), nodes(node_id),
   *  nn(n), odeg(src,outdeg), r0(node_id,pr) in scope. */
  private[queries] def pagerankIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      val p = i - 1
      s"""d$i AS (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS dang
         |  FROM r$p LEFT JOIN odeg ON node_id = src WHERE outdeg IS NULL),
         |f$i AS (SELECT e.dst, CAST(sum(pr // outdeg) AS BIGINT) AS inflow
         |  FROM r$p JOIN odeg ON node_id = odeg.src
         |  JOIN e ON e.src = odeg.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT node_id,
         |  CAST((15 * (1000000000 // n)) // 100
         |    + (85 * (coalesce(inflow, 0) + (dang // n))) // 100 AS BIGINT) AS pr
         |  FROM nodes CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN f$i ON node_id = dst)""".stripMargin
    }.mkString(",\n")

  private val pagerankSql: String = {
    val iterCtes = pagerankIterCtes(prIters)
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
       |  l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS node_id FROM e
       |  UNION SELECT dst AS node_id FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY src),
       |r0 AS (SELECT node_id, CAST(1000000000 // n AS BIGINT) AS pr
       |  FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node_id, pr AS pr_nano FROM r$prIters""".stripMargin
  }

  // Personalized PageRank (Pagerank.personalized): same purchase graph,
  // teleport + dangling mass restricted to the 'BUILDING'-segment seed
  // customers — the TrustRank quality-propagation shape. Bit-exact CTE
  // replay like q_pagerank.
  private def pprQ(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
    val seeds = T(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    graft.operators.Pagerank.personalized(edges, "src", "dst",
      seeds, "c_custkey", iters = prIters)
  }

  private val pprSql: String = {
    val iterCtes = (1 to prIters).map { i =>
      val p = i - 1
      s"""d$i AS (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS dang
         |  FROM r$p LEFT JOIN odeg ON node_id = src WHERE outdeg IS NULL),
         |f$i AS (SELECT e.dst, CAST(sum(pr // outdeg) AS BIGINT) AS inflow
         |  FROM r$p JOIN odeg ON node_id = odeg.src
         |  JOIN e ON e.src = odeg.src
         |  GROUP BY e.dst),
         |r$i AS MATERIALIZED (SELECT node_id, is_seed,
         |  CAST((15 * (CASE WHEN is_seed = 1 THEN 1000000000 // s ELSE 0 END)) // 100
         |    + (85 * (coalesce(inflow, 0)
         |      + (CASE WHEN is_seed = 1 THEN dang // s ELSE 0 END))) // 100
         |    AS BIGINT) AS pr
         |  FROM nodes CROSS JOIN ss CROSS JOIN d$i
         |  LEFT JOIN f$i ON node_id = dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
       |  l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes0 AS (SELECT src AS node_id FROM e
       |  UNION SELECT dst AS node_id FROM e),
       |seeds AS (SELECT DISTINCT c_custkey AS node_id FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |nodes AS (SELECT n.node_id,
       |  CASE WHEN s.node_id IS NULL THEN 0 ELSE 1 END AS is_seed
       |  FROM nodes0 n LEFT JOIN seeds s ON n.node_id = s.node_id),
       |ss AS (SELECT CAST(sum(is_seed) AS BIGINT) AS s FROM nodes),
       |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY src),
       |r0 AS (SELECT node_id, is_seed,
       |  CAST(CASE WHEN is_seed = 1 THEN 1000000000 // s ELSE 0 END AS BIGINT) AS pr
       |  FROM nodes CROSS JOIN ss),
       |$iterCtes
       |SELECT node_id, pr AS pr_nano FROM r$prIters""".stripMargin
  }

  // HITS hubs/authorities (Hits.run) over the same purchase graph:
  // customers are pure hubs, suppliers pure authorities (each side's
  // zero-score half exercises the renormalization's coalesce path). L1
  // renorm in HUGEINT/DECIMAL(38,0) — every half-step replays exactly.
  private def hitsQ(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
    graft.operators.Hits.run(edges, "src", "dst", iters = prIters)
  }

  private val hitsSql: String = {
    val iterCtes = (1 to prIters).map { i =>
      val p = i - 1
      val hPrev = if (p == 0) "h0" else s"h$p"
      // AS MATERIALIZED: DuckDB 1.0 inlines CTEs by reference, and each
      // half-step here is referenced twice — without materialization the
      // 5-round unroll re-evaluates the chain ~4^5 times.
      s"""ar$i AS MATERIALIZED (SELECT e.dst, CAST(sum(h) AS BIGINT) AS raw
         |  FROM $hPrev JOIN e ON node_id = e.src GROUP BY e.dst),
         |asum$i AS (SELECT greatest(coalesce(CAST(sum(raw) AS HUGEINT), 0), 1) AS s
         |  FROM ar$i),
         |a$i AS MATERIALIZED (SELECT n.node_id,
         |  CAST((CAST(coalesce(raw, 0) AS HUGEINT) * 1000000000) // s AS BIGINT) AS a
         |  FROM nodes n CROSS JOIN asum$i LEFT JOIN ar$i ON n.node_id = ar$i.dst),
         |hr$i AS MATERIALIZED (SELECT e.src, CAST(sum(a) AS BIGINT) AS raw
         |  FROM a$i JOIN e ON node_id = e.dst GROUP BY e.src),
         |hsum$i AS (SELECT greatest(coalesce(CAST(sum(raw) AS HUGEINT), 0), 1) AS s
         |  FROM hr$i),
         |h$i AS MATERIALIZED (SELECT n.node_id,
         |  CAST((CAST(coalesce(raw, 0) AS HUGEINT) * 1000000000) // s AS BIGINT) AS h
         |  FROM nodes n CROSS JOIN hsum$i LEFT JOIN hr$i ON n.node_id = hr$i.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src,
       |  l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS node_id FROM e
       |  UNION SELECT dst AS node_id FROM e),
       |h0 AS (SELECT node_id, CAST(1000000000 AS BIGINT) AS h FROM nodes),
       |$iterCtes
       |SELECT h$prIters.node_id, h AS hub_nano, a AS auth_nano
       |FROM h$prIters JOIN a$prIters ON h$prIters.node_id = a$prIters.node_id""".stripMargin
  }

  /** CDC-style compaction: the LATEST event per user by (event time, id)
   *  — one argmax struct aggregate (map-side partial), the "keep the
   *  newest version of every key" upsert shape. Ordering uses µs (`ts
   *  div 1000`) so Spark and the oracle rank identically. */
  private def latestByKeyQ(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(expr("ts div 1000").as("ts_us"), col("event_id"),
        col("event_type"),
        floor(col("value") * 1000).cast("long").as("value_milli")))
        .as("last"))
      .select(col("user_id"), col("last.ts_us").as("ts_us"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"),
        col("last.value_milli").as("value_milli"))

  private val latestByKeySql =
    """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
      |  CAST(floor(value * 1000) AS BIGINT) AS value_milli
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
      |  FROM events
      |) WHERE rk = 1""".stripMargin

  /** Integer-exact correlation components between event value (milli)
   *  and hour-of-day, per type: the covariance and variance NUMERATORS
   *  (n·Σxy − ΣxΣy etc.) in DECIMAL(38,0) — emit the exact integers,
   *  not the FP ratio, so both engines agree digit-for-digit; the
   *  caller divides when it wants Pearson r. One partial-aggregated
   *  pass, #types output rows. */
  private def correlationQ(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events").select(col("event_type"),
      floor(col("value") * 1000).cast("decimal(38,0)").as("x"),
      expr("(ts div 1000 div 3600000000) % 24").cast("decimal(38,0)").as("y"))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n").cast("long").as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("long")
          .as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("long")
          .as("var_x_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("long")
          .as("var_y_num"))
  }

  private val correlationSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(floor(value * 1000) AS HUGEINT) AS x,
      |    CAST(epoch_us(ts) // 3600000000 % 24 AS HUGEINT) AS y
      |  FROM events
      |), s AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM e GROUP BY 1
      |)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS var_x_num,
      |  CAST(n * syy - sy * sy AS BIGINT) AS var_y_num
      |FROM s""".stripMargin

  // User co-activity graph (Graphs.cooccurrenceEdges): users sharing >= 3
  // distinct (event_type, hour) activity cells become a weighted edge —
  // ~12% density at sf0.01, so triangles and communities are both
  // populated and non-degenerate. The hot-cell cap is ACTIVE and
  // SCALE-ROBUST: an absolute constant that bites at sf0.01 guts the
  // graph at sf0.1 (cells are ~10× denser there — measured: cap 8 left
  // ZERO cells at sf0.1), so the cap is the exact P99 ORDER STATISTIC
  // of cell sizes, computed independently by both engines with the
  // winsorize rank formula `(n−1)·ppm div 10⁶ + 1` — drops the busiest
  // ~1% of cells at every sf (22 cells at sf0.01, 27 at sf0.1, none at
  // sf0.001 where the distribution is flat). The quantile pass is
  // cells-table bounded (types × hours — never event volume); for cell
  // definitions with unbounded cell COUNTS swap the TakeOrdered cut for
  // GlobalSequence ranks. Shared by q_triangles / q_label_prop /
  // q_kcore / q_bfs / the flagships; the SQL fragment below is the
  // bit-exact oracle twin (cap CTE = the same rank formula).
  private val coActCellPpm = 990000L
  private val coActCapCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Exact order statistic: the value at 1-based rank
   *  `(n−1)·ppm div 10⁶ + 1` of `valueCol` ascending — winsorize's
   *  quantile index, non-negative operands so Spark DIV ≡ DuckDB //. */
  private def exactQuantile(df: DataFrame, valueCol: String,
      ppm: Long): Long = {
    val n = df.count()
    if (n == 0L) Long.MaxValue
    else {
      val idx = ((n - 1L) * ppm) / 1000000L + 1L
      // limit() is Int-bounded — fail loudly instead of wrapping the
      // rank for tables beyond ~2.1e9 rows (swap in GlobalSequence
      // ranks for that regime, as the cap Scaladocs note).
      require(idx <= Int.MaxValue.toLong,
        s"order-statistic rank $idx exceeds the TakeOrdered cut — " +
          "use GlobalSequence ranks for tables this large")
      df.select(col(valueCol)).orderBy(col(valueCol)).limit(idx.toInt)
        .agg(max(col(valueCol))).head().getLong(0)
    }
  }

  private def coActDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events").select(col("user_id"), col("event_type"),
      expr("ts div 1000 div 3600000000").as("hr"))

  // max(_, 2): a P99 of 1 on degenerate/sparse data would trip the
  // operator's maxCellEntities >= 2 require over a parameter the query
  // derived, not the caller chose — clamped identically in the oracle
  // (greatest(…, 2)), where it is equally vacuous on real data (cells
  // of size <= 2 carry at most one pair either way).
  private def coActCellCap(s: SparkSession, dir: String): Long =
    coActCapCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => math.max(2L, exactQuantile(
        coActDistinct(s, dir).distinct()
          .groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("k")),
        "k", coActCellPpm)))

  // saltBuckets = 1: the P99 cap already bounds per-cell work to
  // C(cap, 2) slim pairs — salting ON TOP would replicate the exploded
  // (entity, cell) table ~S/2+1× through the shuffle for protection the
  // cap provides (measured 2-3× wall-clock at sf0.1 for zero candidate
  // change). Cap and salt are ALTERNATIVE hot-cell defenses: cap when
  // dropping pathological cells is acceptable, salt when exactness
  // demands enumerating them (the operator default).
  private def coActivityEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.cooccurrenceEdges(
      coActDistinct(s, dir),
      "user_id", Seq("event_type", "hr"), minWeight = 3L,
      maxCellEntities = coActCellCap(s, dir), saltBuckets = 1)

  // d0/d/e are AS MATERIALIZED: DuckDB 1.0 inlines CTEs per reference
  // (CLAUDE.md q_hits pitfall), and the co-occurrence self-join in e is
  // the heaviest part of every graph oracle — the LPA/PageRank unrolls
  // reference it once per round.
  private val coActSql =
    s"""d0 AS MATERIALIZED (SELECT DISTINCT user_id, event_type,
       |    epoch_us(ts) // 3600000000 AS hr FROM events),
       |cc AS MATERIALIZED (SELECT event_type, hr,
       |    CAST(count(*) AS BIGINT) AS k
       |  FROM d0 GROUP BY 1, 2),
       |ccap AS MATERIALIZED (SELECT greatest(max(k), 2) AS cap FROM (
       |  SELECT k FROM cc ORDER BY k
       |  LIMIT (SELECT (count(*) - 1) * $coActCellPpm // 1000000 + 1 FROM cc))),
       |d AS MATERIALIZED (SELECT d0.* FROM d0 JOIN (
       |    SELECT event_type, hr FROM cc, ccap WHERE k <= cap) cells
       |  USING (event_type, hr)),
       |e AS MATERIALIZED (SELECT a.user_id AS u, b.user_id AS v,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.hr = b.hr
       |    AND a.user_id < b.user_id
       |  GROUP BY 1, 2 HAVING count(*) >= 3)""".stripMargin

  /** Degree-distribution histogram of the co-activity graph — the
   *  shape audit read before picking hub caps and salt factors (a heavy
   *  right tail is what the P97/P99 order-statistic caps exist for).
   *  Composes the shared edge chain with `Audit.histogram`'s
   *  integer-exact equi-width buckets; the edge set is
   *  localCheckpoint'ed — BOTH endpoint projections read it, and
   *  re-running the pair mining per reference is the multi-reference
   *  trap. 10 rows. */
  private def degreeHistQ(s: SparkSession, dir: String): DataFrame = {
    val edges = coActivityEdges(s, dir).localCheckpoint()
    val deg = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
      .withColumn("__g", lit("all"))
    graft.operators.Audit.histogram(deg, "d", "__g", nBuckets = 10,
        scale = 1L)
      .select(col("bucket"), col("n"),
        col("lo_milli").as("lo_deg"), col("hi_milli").as("hi_deg"))
  }

  private val degreeHistSql =
    s"""WITH $coActSql,
       |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
       |  SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) t
       |  GROUP BY 1),
       |b AS (SELECT min(d) AS lo, max(d) AS hi FROM deg)
       |SELECT ((deg.d - b.lo) * 10) // (b.hi - b.lo + 1) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(deg.d) AS BIGINT) AS lo_deg,
       |  CAST(max(deg.d) AS BIGINT) AS hi_deg
       |FROM deg, b GROUP BY 1""".stripMargin

  /** Exact per-node triangle counts over the co-activity graph
   *  (degree-oriented wedge closure — see Graphs.triangleCounts). */
  private def trianglesQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.triangleCounts(coActivityEdges(s, dir), "u", "v")

  private val trianglesSql =
    s"""WITH $coActSql,
       |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1 JOIN e e2 ON e2.u = e1.v
       |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       |n AS (SELECT a AS node_id FROM tri
       |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |SELECT node_id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM n GROUP BY 1""".stripMargin

  /** Deterministic sync label-propagation communities, 3 unrolled
   *  rounds, (weight desc, label asc) tie-break (Graphs.labelPropagation). */
  private val lpaIters = 3
  private def labelPropQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.labelPropagation(
      coActivityEdges(s, dir), "u", "v", "w", iters = lpaIters)

  /** The LPA round CTE chain over the co-activity graph, shared by
   *  `q_label_prop` and the `pipeline_user_segments` flagship so the two
   *  oracles cannot drift. Exposes `l$lpaIters` as (node_id, label). */
  private val labelPropCtes: String = {
    val iterCtes = (1 to lpaIters).map { i =>
      val p = i - 1
      s"""c$i AS MATERIALIZED (SELECT adj.u AS node_id, l.label AS lbl,
         |    CAST(sum(w) AS BIGINT) AS ws
         |  FROM adj JOIN l$p l ON adj.v = l.node_id GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node_id, lbl AS label FROM (
         |  SELECT node_id, lbl,
         |    row_number() OVER (PARTITION BY node_id ORDER BY ws DESC, lbl) AS rk
         |  FROM c$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""$coActSql,
       |adj AS MATERIALIZED (SELECT u, v, w FROM e
       |  UNION ALL SELECT v, u, w FROM e),
       |l0 AS (SELECT node_id, node_id AS label FROM
       |  (SELECT u AS node_id FROM e UNION SELECT v FROM e)),
       |$iterCtes""".stripMargin
  }

  private val labelPropSql: String =
    s"""WITH $labelPropCtes
       |SELECT node_id, label FROM l$lpaIters""".stripMargin

  /**
   * Composition flagship over the graph family: co-activity graph →
   * label-propagation communities → per-community activity report
   * (members, events, purchase count), communities labeled by their LPA
   * label, singleton users (no qualifying edges) bucketed under their
   * own id. The oracle recomputes the graph, replays all three LPA
   * rounds, and re-aggregates the raw event log — the hash certifies
   * the whole chain. 100 TB shape: the segment map is |users| slim
   * rows; the event aggregate is the only log-sized pass and it
   * partial-aggregates per (user) before the label join.
   */
  private def userSegmentsQ(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.operators.Graphs.labelPropagation(
      coActivityEdges(s, dir), "u", "v", "w", iters = lpaIters)
    val perUser = T(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
    perUser
      .join(labels, perUser("user_id") === labels("node_id"), "left")
      .select(coalesce(col("label"), col("user_id")).as("segment"),
        col("n_events"), col("n_purchases"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        sum(col("n_purchases")).as("n_purchases"))
  }

  private val userSegmentsSql =
    s"""WITH $labelPropCtes,
       |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
       |      AS n_purchases
       |  FROM events GROUP BY 1)
       |SELECT coalesce(l.label, pu.user_id) AS segment,
       |  CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(n_events) AS BIGINT) AS n_events,
       |  CAST(sum(n_purchases) AS BIGINT) AS n_purchases
       |FROM pu LEFT JOIN l$lpaIters l ON pu.user_id = l.node_id
       |GROUP BY 1""".stripMargin

  /** Weighted PageRank over the co-activity graph (both directions, edge
   *  weight = shared activity cells): rank splits ∝ weight per out-edge,
   *  every iteration integer-exact (Pagerank.runWeighted). */
  private def pagerankWeightedQ(s: SparkSession, dir: String): DataFrame = {
    val e = coActivityEdges(s, dir)
    val adj = e.union(e.select(col("v").as("u"), col("u").as("v"), col("w")))
    graft.operators.Pagerank.runWeighted(adj, "u", "v", "w", iters = prIters)
  }

  private val pagerankWeightedSql: String = {
    val iterCtes = (1 to prIters).map { i =>
      val p = i - 1
      s"""d$i AS MATERIALIZED (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS dang
         |  FROM r$p LEFT JOIN outw ON node_id = src WHERE wsum IS NULL),
         |f$i AS MATERIALIZED (SELECT we.dst,
         |    CAST(sum((pr * we.w) // wsum) AS BIGINT) AS inflow
         |  FROM r$p JOIN outw ON node_id = outw.src
         |  JOIN we ON we.src = outw.src
         |  GROUP BY we.dst),
         |r$i AS MATERIALIZED (SELECT node_id,
         |  CAST((15 * (1000000000 // n)) // 100
         |    + (85 * (coalesce(inflow, 0) + (dang // n))) // 100 AS BIGINT) AS pr
         |  FROM nodes CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN f$i ON node_id = dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coActSql,
       |we AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM e
       |  UNION ALL SELECT v, u, w FROM e),
       |nodes AS (SELECT src AS node_id FROM we
       |  UNION SELECT dst AS node_id FROM we),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum
       |  FROM we GROUP BY src),
       |r0 AS (SELECT node_id, CAST(1000000000 // n AS BIGINT) AS pr
       |  FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node_id, pr AS pr_nano FROM r$prIters""".stripMargin
  }

  /** 12-core backbone of the co-activity graph after 3 peel rounds
   *  (Graphs.kCore) — surviving nodes with their in-core degree (k=12
   *  peels ~20% of nodes at sf0.01, so the rounds do real work). */
  private val kCoreK = 12
  private val kCoreRounds = 3
  private def kCoreQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.kCore(coActivityEdges(s, dir), "u", "v",
      k = kCoreK, rounds = kCoreRounds)

  private val kCoreSql: String = {
    val iterCtes = (1 to kCoreRounds).map { i =>
      val p = i - 1
      s"""n$i AS MATERIALIZED (SELECT x FROM (
         |    SELECT u AS x FROM e$p UNION ALL SELECT v FROM e$p)
         |  GROUP BY x HAVING count(*) >= $kCoreK),
         |e$i AS MATERIALIZED (SELECT e$p.u, e$p.v FROM e$p
         |  JOIN n$i a ON e$p.u = a.x JOIN n$i b ON e$p.v = b.x)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coActSql,
       |e0 AS (SELECT u, v FROM e),
       |$iterCtes
       |SELECT x AS node_id, CAST(count(*) AS BIGINT) AS deg FROM (
       |  SELECT u AS x FROM e$kCoreRounds UNION ALL SELECT v FROM e$kCoreRounds)
       |GROUP BY x""".stripMargin
  }

  /** Hop distance from the purchaser seed set within 3 hops of the
   *  co-activity graph (Graphs.bfsDistances) — the influence-radius
   *  report; the oracle unrolls the frontier expansion. */
  private val bfsHops = 3
  private def bfsQ(s: SparkSession, dir: String): DataFrame = {
    val seeds = T(s, dir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    graft.operators.Graphs.bfsDistances(coActivityEdges(s, dir), "u", "v",
      seeds, "user_id", maxHops = bfsHops)
  }

  private val bfsSql: String = {
    val iterCtes = (1 to bfsHops).map { i =>
      val p = i - 1
      s"""f$i AS MATERIALIZED (SELECT DISTINCT adj.v AS node_id
         |  FROM adj JOIN bd$p ON adj.u = bd$p.node_id WHERE bd$p.dist = ${p}),
         |bd$i AS MATERIALIZED (SELECT node_id, dist FROM bd$p
         |  UNION ALL SELECT f$i.node_id, CAST($i AS BIGINT) AS dist
         |  FROM f$i LEFT JOIN bd$p ON f$i.node_id = bd$p.node_id
         |  WHERE bd$p.node_id IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coActSql,
       |adj AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
       |bd0 AS (SELECT DISTINCT user_id AS node_id, CAST(0 AS BIGINT) AS dist
       |  FROM events WHERE event_type = 'purchase'),
       |$iterCtes
       |SELECT node_id, dist FROM bd$bfsHops""".stripMargin
  }

  /** Top-100 non-adjacent pairs by (common neighbors, preferential
   *  attachment) over the co-activity graph (Graphs.linkPrediction). The
   *  hub cap is ACTIVE and SCALE-ROBUST like the cell cap: the exact P97
   *  ORDER STATISTIC of node degrees (= 30 at sf0.01 — drops the top
   *  ~3% hubs from wedge enumeration; 281 at sf0.1 where degrees are an
   *  order of magnitude higher). Capped common-neighbor counts, mirrored
   *  in the oracle's `dc.d <=` predicate; `pa` keeps TRUE degrees on
   *  both sides. The degree-quantile pass is |V|-bounded. */
  private val linkPredictCenterPpm = 970000L
  private val linkPredictCapCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def linkPredictCenterCap(s: SparkSession, dir: String): Long =
    linkPredictCapCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir",
      _ => {
        val e = coActivityEdges(s, dir)
        val adj = e.select(col("u").as("x"))
          .union(e.select(col("v").as("x")))
        // max(_, 2) for the same derived-cap degeneracy guard as
        // coActCellCap, mirrored by greatest(…, 2) in the oracle.
        math.max(2L, exactQuantile(
          adj.groupBy(col("x")).agg(count(lit(1)).as("d")),
          "d", linkPredictCenterPpm))
      })

  // saltBuckets = 1 for the same cap-vs-salt reason as coActivityEdges:
  // the P97 center cap bounds per-center wedge blocks to C(cap, 2).
  private def linkPredictQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.linkPrediction(coActivityEdges(s, dir), "u", "v",
      k = 100, maxCenterDegree = linkPredictCenterCap(s, dir),
      saltBuckets = 1)

  private val linkPredictSql =
    s"""WITH $coActSql,
       |adj AS MATERIALIZED (SELECT u AS x, v AS n FROM e
       |  UNION ALL SELECT v, u FROM e),
       |deg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS d
       |  FROM adj GROUP BY 1),
       |dcap AS MATERIALIZED (SELECT greatest(max(d), 2) AS cap FROM (
       |  SELECT d FROM deg ORDER BY d
       |  LIMIT (SELECT (count(*) - 1) * $linkPredictCenterPpm // 1000000 + 1
       |    FROM deg))),
       |cand AS (SELECT a1.x AS a, a2.x AS b, CAST(count(*) AS BIGINT) AS cn
       |  FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
       |  JOIN deg dc ON a1.n = dc.x
       |  CROSS JOIN dcap WHERE dc.d <= dcap.cap
       |  GROUP BY 1, 2),
       |non AS (SELECT cand.a, cand.b, cand.cn FROM cand
       |  LEFT JOIN e ON cand.a = e.u AND cand.b = e.v WHERE e.u IS NULL)
       |SELECT a, b, cn, da.d * db.d AS pa
       |FROM non JOIN deg da ON a = da.x JOIN deg db ON b = db.x
       |ORDER BY cn DESC, pa DESC, a, b LIMIT 100""".stripMargin

  /** Resource-Allocation link prediction: the degree-discounted score
   *  over the same capped co-activity graph — each shared neighbor
   *  contributes `1e6 div deg` micro-units (per-term floor, so the sum
   *  replays exactly). Same hub cap and salt settings as q_link_predict. */
  private def resourceAllocQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.resourceAllocation(coActivityEdges(s, dir),
      "u", "v", k = 100, maxCenterDegree = linkPredictCenterCap(s, dir),
      saltBuckets = 1)

  private val resourceAllocSql =
    s"""WITH $coActSql,
       |adj AS MATERIALIZED (SELECT u AS x, v AS n FROM e
       |  UNION ALL SELECT v, u FROM e),
       |deg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS d
       |  FROM adj GROUP BY 1),
       |dcap AS MATERIALIZED (SELECT greatest(max(d), 2) AS cap FROM (
       |  SELECT d FROM deg ORDER BY d
       |  LIMIT (SELECT (count(*) - 1) * $linkPredictCenterPpm // 1000000 + 1
       |    FROM deg))),
       |cand AS (SELECT a1.x AS a, a2.x AS b, CAST(count(*) AS BIGINT) AS cn,
       |    CAST(sum(1000000 // dc.d) AS BIGINT) AS ra_units
       |  FROM adj a1 JOIN adj a2 ON a1.n = a2.n AND a1.x < a2.x
       |  JOIN deg dc ON a1.n = dc.x
       |  CROSS JOIN dcap WHERE dc.d <= dcap.cap
       |  GROUP BY 1, 2)
       |SELECT cand.a, cand.b, cand.cn, cand.ra_units FROM cand
       |LEFT JOIN e ON cand.a = e.u AND cand.b = e.v WHERE e.u IS NULL
       |ORDER BY ra_units DESC, cn DESC, a, b LIMIT 100""".stripMargin

  /**
   * Graph-signal FEATURE ASSEMBLY flagship: the three structural
   * signals a quality model consumes — weighted PageRank (global
   * influence), triangle count (local clustering), k-core degree
   * (backbone membership) — computed over the same co-activity graph
   * and left-joined into one per-node feature row (absent signals 0).
   * This is the feature-engineering join every entity-quality model
   * runs before training; the oracle recomputes all three signals from
   * the raw log inside one WITH (disjoint CTE namespaces) and replays
   * the join, so the hash certifies the ASSEMBLY, not just the parts.
   * 100 TB shape: three slim signal tables keyed by node id, one
   * node-keyed join — the signals' own costs dominate; assembly adds
   * two hash joins over |V| rows.
   */
  private def graphFeaturesQ(s: SparkSession, dir: String): DataFrame = {
    val edges = coActivityEdges(s, dir).localCheckpoint()
    val adj = edges.union(
      edges.select(col("v").as("u"), col("u").as("v"), col("w")))
    val pr = graft.operators.Pagerank.runWeighted(adj, "u", "v", "w",
      iters = prIters)
    val tri = graft.operators.Graphs.triangleCounts(edges, "u", "v")
    val core = graft.operators.Graphs.kCore(edges, "u", "v",
      k = kCoreK, rounds = kCoreRounds)
    pr
      .join(tri, Seq("node_id"), "left")
      .join(core.select(col("node_id"), col("deg").as("core_deg")),
        Seq("node_id"), "left")
      .select(col("node_id"), col("pr_nano"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
  }

  private val graphFeaturesSql: String = {
    val prCtes = (1 to prIters).map { i =>
      val p = i - 1
      s"""gd$i AS MATERIALIZED (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS dang
         |  FROM gr$p LEFT JOIN outw ON node_id = src WHERE wsum IS NULL),
         |gf$i AS MATERIALIZED (SELECT we.dst,
         |    CAST(sum((pr * we.w) // wsum) AS BIGINT) AS inflow
         |  FROM gr$p JOIN outw ON node_id = outw.src
         |  JOIN we ON we.src = outw.src
         |  GROUP BY we.dst),
         |gr$i AS MATERIALIZED (SELECT node_id,
         |  CAST((15 * (1000000000 // n)) // 100
         |    + (85 * (coalesce(inflow, 0) + (dang // n))) // 100 AS BIGINT) AS pr
         |  FROM gnodes CROSS JOIN gnn CROSS JOIN gd$i
         |  LEFT JOIN gf$i ON node_id = dst)""".stripMargin
    }.mkString(",\n")
    val coreCtes = (1 to kCoreRounds).map { i =>
      val p = i - 1
      s"""kn$i AS MATERIALIZED (SELECT x FROM (
         |    SELECT u AS x FROM ke$p UNION ALL SELECT v FROM ke$p)
         |  GROUP BY x HAVING count(*) >= $kCoreK),
         |ke$i AS MATERIALIZED (SELECT ke$p.u, ke$p.v FROM ke$p
         |  JOIN kn$i a ON ke$p.u = a.x JOIN kn$i b ON ke$p.v = b.x)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coActSql,
       |we AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM e
       |  UNION ALL SELECT v, u, w FROM e),
       |gnodes AS (SELECT src AS node_id FROM we
       |  UNION SELECT dst AS node_id FROM we),
       |gnn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gnodes),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum
       |  FROM we GROUP BY src),
       |gr0 AS (SELECT node_id, CAST(1000000000 // n AS BIGINT) AS pr
       |  FROM gnodes CROSS JOIN gnn),
       |$prCtes,
       |tri AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1 JOIN e e2 ON e2.u = e1.v
       |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       |tcount AS (SELECT x AS node_id, CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM (SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri) GROUP BY x),
       |ke0 AS (SELECT u, v FROM e),
       |$coreCtes,
       |kdeg AS (SELECT x AS node_id, CAST(count(*) AS BIGINT) AS core_deg
       |  FROM (SELECT u AS x FROM ke$kCoreRounds
       |    UNION ALL SELECT v FROM ke$kCoreRounds) GROUP BY x)
       |SELECT gr$prIters.node_id, pr AS pr_nano,
       |  coalesce(n_triangles, 0) AS n_triangles,
       |  coalesce(core_deg, 0) AS core_deg
       |FROM gr$prIters
       |LEFT JOIN tcount ON gr$prIters.node_id = tcount.node_id
       |LEFT JOIN kdeg ON gr$prIters.node_id = kdeg.node_id""".stripMargin
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank"        -> (pagerankQ _),
    "pipeline_graph_features" -> (graphFeaturesQ _),
    "q_triangles"       -> (trianglesQ _),
    "q_degree_hist"     -> (degreeHistQ _),
    "q_label_prop"      -> (labelPropQ _),
    "q_link_predict"    -> (linkPredictQ _),
    "q_resource_alloc"  -> (resourceAllocQ _),
    "q_kcore"           -> (kCoreQ _),
    "q_bfs_distance"    -> (bfsQ _),
    "pipeline_user_segments" -> (userSegmentsQ _),
    "q_pagerank_weighted" -> (pagerankWeightedQ _),
    "q_latest_by_key"   -> (latestByKeyQ _),
    "q_correlation"     -> (correlationQ _),
    "q_ppr"             -> (pprQ _),
    "q_hits"            -> (hitsQ _),
    "q1_agg"            -> (q1Agg _),
    "q_agg_distinct"    -> (aggDistinct _),
    "q_agg_stats"       -> (aggStats _),
    "q_agg_argmax"      -> (aggArgmax _),
    "q_rollup"          -> (rollup _),
    "q_cube"            -> (cube _),
    "q_grouping_sets"   -> (groupingSets _),
    "q_join_broadcast"  -> (joinBroadcast _),
    "q_star_join"       -> (starJoin _),
    "q_join_shuffle"    -> (joinShuffle _),
    "q_join_skew"       -> (joinSkew _),
    "q_join_outer"      -> (joinOuter _),
    "q_join_semi"       -> (joinSemi _),
    "q_join_anti"       -> (joinAnti _),
    "q_join_nullsafe"   -> (joinNullsafe _),
    "q_unpivot"         -> (unpivotQ _),
    "q_join_range"      -> (joinRange _),
    "q_join_asof"       -> (joinAsOf _),
    "q_join_asof_fwd"   -> (joinAsOfForward _),
    "q_window_rank"     -> (windowRank _),
    "q_window_running"  -> (windowRunning _),
    "q_window_range"    -> (windowRange _),
    "q_agg_percentiles" -> (aggPercentiles _),
    "q_agg_quantile_verify" -> (aggQuantileVerify _),
    "q_agg_topk_typed"  -> (aggTopkTyped _),
    "q_window_lag_lead" -> (windowLagLead _),
    "q_topk_per_group"  -> (topkPerGroup _),
    "q_sort_limit"      -> (sortLimit _),
    "q_set_ops"         -> (setOps _),
    "q_subqueries"      -> (subqueries _),
    "q_scalar_string"   -> (scalarString _),
    "q_scalar_date"     -> (scalarDate _),
    "q_scalar_mathjson" -> (scalarMathJson _),
    "q_scalar_array"    -> (scalarArray _),
    "q_pivot"           -> (pivot _)
  )

  override val oracles: Map[String, String] = Map(
    "q_pagerank"        -> pagerankSql,
    "pipeline_graph_features" -> graphFeaturesSql,
    "q_triangles"       -> trianglesSql,
    "q_degree_hist"     -> degreeHistSql,
    "q_label_prop"      -> labelPropSql,
    "q_link_predict"    -> linkPredictSql,
    "q_resource_alloc"  -> resourceAllocSql,
    "q_kcore"           -> kCoreSql,
    "q_bfs_distance"    -> bfsSql,
    "pipeline_user_segments" -> userSegmentsSql,
    "q_pagerank_weighted" -> pagerankWeightedSql,
    "q_latest_by_key"   -> latestByKeySql,
    "q_correlation"     -> correlationSql,
    "q_ppr"             -> pprSql,
    "q_hits"            -> hitsSql,
    "q1_agg"            -> q1AggSql,
    "q_agg_distinct"    -> aggDistinctSql,
    "q_agg_stats"       -> aggStatsSql,
    "q_agg_argmax"      -> aggArgmaxSql,
    "q_rollup"          -> rollupSql,
    "q_cube"            -> cubeSql,
    "q_grouping_sets"   -> groupingSetsSql,
    "q_join_broadcast"  -> joinBroadcastSql,
    "q_star_join"       -> starJoinSql,
    "q_join_shuffle"    -> joinShuffleSql,
    "q_join_skew"       -> joinSkewSql,
    "q_join_outer"      -> joinOuterSql,
    "q_join_semi"       -> joinSemiSql,
    "q_join_anti"       -> joinAntiSql,
    "q_join_nullsafe"   -> joinNullsafeSql,
    "q_unpivot"         -> unpivotSql,
    "q_join_range"      -> joinRangeSql,
    "q_join_asof"       -> joinAsOfSql,
    "q_join_asof_fwd"   -> joinAsOfForwardSql,
    "q_window_rank"     -> windowRankSql,
    "q_window_running"  -> windowRunningSql,
    "q_window_range"    -> windowRangeSql,
    "q_agg_percentiles" -> aggPercentilesSql,
    "q_agg_quantile_verify" -> aggQuantileVerifySql,
    "q_agg_topk_typed"  -> aggTopkTypedSql,
    "q_window_lag_lead" -> windowLagLeadSql,
    "q_topk_per_group"  -> topkPerGroupSql,
    "q_sort_limit"      -> sortLimitSql,
    "q_set_ops"         -> setOpsSql,
    "q_subqueries"      -> subqueriesSql,
    "q_scalar_string"   -> scalarStringSql,
    "q_scalar_date"     -> scalarDateSql,
    "q_scalar_mathjson" -> scalarMathJsonSql,
    "q_scalar_array"    -> scalarArraySql,
    "q_pivot"           -> pivotSql
  )
}
