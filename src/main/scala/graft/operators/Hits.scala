package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HITS hubs & authorities (Kleinberg 1999) over an edge table — the
 * second classic link-graph quality signal next to
 * [[graft.operators.Pagerank]]: an *authority* is a node pointed at by
 * good hubs, a *hub* points at good authorities. Web-curation pipelines
 * use the authority score as a topic-local quality weight (it reacts to
 * local link structure where PageRank measures global reachability).
 * Not in the reference (no graph surface); SURVEY.md §2.6 north-star
 * addition.
 *
 * Fixed-iteration mutual recursion with L1 normalization each half-step:
 * `a_raw(v) = Σ_{u→v} h(u)`, then `a(v) = (a_raw(v)·ONE) DIV Σ a_raw`;
 * `h_raw(u) = Σ_{u→v} a(v)`, then `h(u) = (h_raw(u)·ONE) DIV Σ h_raw`.
 * (The textbook uses L2 — sqrt is not exactly replayable cross-engine,
 * and any positive-scalar normalization yields the same RANKING each
 * round, which is what the signal is consumed for.) All arithmetic is
 * integer: scores are nano-units, the normalizing product runs in
 * DECIMAL(38,0) on Spark and HUGEINT in DuckDB (entries ≤ ONE, raw sums
 * ≤ N·ONE, product ≤ N·ONE² ≈ 10²⁸ at N = 10¹⁰ — inside 38 digits), and
 * every division is `DIV`/`//`, so the oracle's CTE unroll replays every
 * iteration bit-exactly.
 *
 * 100 TB shape: per iteration, one join of the slim (node, score) table
 * against edges partitioned by src (authority half) and one against
 * edges partitioned by dst (hub half) — the edge table is cached TWICE,
 * once per orientation, trading 2× edge storage for zero edge shuffle
 * per round; shuffles carry only (8-byte id, 8-byte score) pairs. The
 * normalizing sums are micro-jobs over the half-step's checkpointed raw
 * aggregate, landing as driver literals (no per-round broadcast
 * exchange, no double execution of the join+agg). Scores are
 * localCheckpoint'ed per half-step so lineage stays one round deep.
 * (Σ h over the graph overflows a BIGINT only past ~9·10⁹ nodes; at
 * that scale, lower ONE to 10⁶.)
 */
object Hits {

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** (node_id, hub_nano, auth_nano) after `iters` rounds over the
   *  DISTINCT (src, dst) edges; every endpoint appears. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 100, "need 1 <= iters <= 100")
    val ONE = 1000000000L
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      // NULL endpoints are not nodes (a null id row would ride the node
      // table into the output with zero scores) — same exclusion as
      // Pagerank.run.
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val eBySrc = e0.repartition(col("src")).persist()
    // Derive the dst orientation and node set FROM the cached src copy so
    // the distinct() scan runs once, not three times.
    val eByDst = eBySrc.repartition(col("dst")).persist()
    val nodes = eBySrc.select(col("src").as("node_id"))
      .union(eBySrc.select(col("dst").as("node_id")))
      .distinct().persist()

    // Half-step state carries ONLY nodes with a nonzero raw score: a node
    // absent from the aggregate would normalize to exactly 0, and zero
    // scores contribute nothing to the next half-step's sums — so the
    // iteration never densifies to the full node set (pure hubs stay out
    // of the authority table and vice versa, roughly halving per-round
    // state and dropping a |V|-sized left join + checkpoint per
    // half-step). The full node set is re-attached once, at output time,
    // with the same coalesce-to-0 the oracle applies every round —
    // bit-identical results.
    def renorm(raw: DataFrame, keyCol: String, out: String): DataFrame = {
      // ONE action per half-step (r17 fold — was 2: raw checkpoint +
      // sum micro-job): the normalizing sum rides the normalization as
      // a 1-row broadcast aggregate over the SAME shuffle, which AQE
      // exchange reuse materializes once (both subtrees are alias-
      // identical below the Exchange — NOT the pre-r8 shape, where the
      // sum was a separate ACTION and no reuse could apply).
      // `greatest(s, 1)` == the old driver-side `math.max(s, 1)`, and
      // DIV by the column replays DIV by the literal bit-exactly.
      val sumDf = raw.agg(coalesce(sum(col("raw")), lit(0L)).as("s"))
      raw.crossJoin(broadcast(sumDf))
        .select(col(keyCol).as("node_id"),
          expr(s"CAST((CAST(raw AS DECIMAL(38,0)) * $ONE)" +
            s" DIV greatest(s, CAST(1 AS BIGINT)) AS BIGINT)").as(out))
        .localCheckpoint()
    }

    // Initial hubs: ONE on every node, but only src hubs are ever read.
    var hub = eBySrc.select(col("src").as("node_id")).distinct()
      .select(col("node_id"), lit(ONE).as("h")).localCheckpoint()
    var auth: DataFrame = null
    try {
      for (_ <- 1 to iters) {
        val aRaw = eBySrc.join(hub, eBySrc("src") === hub("node_id"))
          .groupBy(col("dst")).agg(sum(col("h")).as("raw"))
        val prevA = auth
        auth = renorm(aRaw, "dst", "a")
        if (prevA != null) unpersistCheckpoint(prevA)
        val hRaw = eByDst.join(auth, eByDst("dst") === auth("node_id"))
          .groupBy(col("src")).agg(sum(col("a")).as("raw"))
        val prevH = hub
        hub = renorm(hRaw, "src", "h")
        unpersistCheckpoint(prevH)
      }
    } finally {
      eBySrc.unpersist(false); eByDst.unpersist(false)
    }
    val out = nodes
      .join(hub, Seq("node_id"), "left")
      .join(auth, Seq("node_id"), "left")
      .select(col("node_id"),
        coalesce(col("h"), lit(0L)).as("hub_nano"),
        coalesce(col("a"), lit(0L)).as("auth_nano"))
    nodes.unpersist(false)
    out
  }
}
