package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank (Page et al. 1999) over an edge table — the link-graph
 * centrality signal web-curation pipelines use for source/domain quality
 * weighting (Common Crawl publishes exactly this shape as its host-level
 * ranks). Not in the reference (no graph surface); SURVEY.md §2.6
 * north-star addition.
 *
 * Fixed-iteration power method with dangling-mass redistribution:
 * `pr'(v) = (100−d)·(ONE/N)/100 + d·(Σ_in pr(u)/outdeg(u) + dang/N)/100`
 * where `dang` is the total rank parked on nodes with no out-edges.
 * ALL arithmetic is integer nano-units with integer division (`DIV` /
 * DuckDB `//` — identical on non-negative operands), so every
 * iteration — and therefore the fixpoint after any number of rounds —
 * replays bit-exactly cross-engine; the oracle unrolls the same
 * iterations as CTEs. Integer truncation loses < N·iters nano-units of
 * mass total, which is noise for ranking and a price worth paying for
 * exact cross-engine replay.
 *
 * 100 TB shape: the canonical Pregel cost — per iteration, one join of
 * the slim (node, pr, outdeg) rank table with the edge table partitioned
 * by src, and one re-aggregation partitioned by dst; shuffles carry
 * (8-byte id, 8-byte rank) pairs, never payloads. Per-round FIXED cost
 * is kept to two jobs (the round-8 scheduler-overhead fix — at small
 * graph sizes fixed cost dominates, at web scale it's free headroom):
 * N is a driver literal computed once before the loop, and the dangling
 * sum rides the SAME aggregation pass as the inflow (dangling nodes
 * contribute their rank under a NULL dst sentinel), so the rank⋈outdeg
 * join executes once per round, the |V|-row aggregate is
 * localCheckpoint'ed, and the dang scalar is a micro-job over that
 * checkpoint — no per-round broadcast exchanges at all. Ranks are
 * `localCheckpoint`ed per round (previous round's blocks freed), so
 * lineage stays one round deep no matter how many iterations run.
 * Iteration count is fixed and small (the web-graph standard is O(10)
 * rounds to ranking stability) — cost is iters × (|E| join + |E| agg),
 * embarrassingly scalable.
 */
object Pagerank {

  /** Free a localCheckpoint'ed frame's blocks (same discipline as
   *  `Bpe.train` / `Clusters.connectedComponents` round caches). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** Ranks after `iters` power iterations over the DISTINCT (src, dst)
   *  edges: (node_id, pr_nano) for every node appearing as an endpoint.
   *  `dampingPct` is the damping factor in percent (85 = the published
   *  0.85). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, "need 1 <= iters <= 100")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percent")
    val ONE = 1000000000L
    // Re-partition the deduped edges by src BEFORE caching: distinct()
    // leaves hash(src, dst) partitioning, under which every iteration's
    // contribution join would re-shuffle the FULL edge table; cached as
    // hash(src) the per-iteration join co-locates against the rank side
    // and only (id, rank) pairs move — |E|-shuffle once, |V|-shuffle per
    // round, the difference that dominates at web-graph scale.
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      // NULL endpoints (e.g. a non-numeric id that cast to null) are not
      // nodes: drop them up front. Without this, a null-dst edge's
      // contribution would land in the fused aggregate's NULL-dst
      // sentinel and be misread as DANGLING mass (the oracle computes
      // dang from rank rows only, so results would silently diverge).
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id")))
      .distinct().persist()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    // n is a one-time driver literal: a per-round broadcast of the same
    // 1-row aggregate was pure fixed cost. Same integer math (ONE DIV n).
    val n = nodes.count()
    if (n == 0L) {
      e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
      return nodes.select(col("node_id"), lit(0L).as("pr_nano"))
    }
    val base = ((100L - dampingPct) * (ONE / n)) / 100L

    var ranks = nodes
      .select(col("node_id"), lit(ONE / n).as("pr"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        // ONE pass over rank⋈outdeg: per-edge contributions keyed by dst,
        // dangling rank parked under a NULL dst sentinel. ONE action per
        // round (r17 fold — was 3: agg checkpoint, dang collect, rank
        // checkpoint): the dangling mass rides the rank update as a 1-row
        // broadcast aggregate over the SAME dst-keyed shuffle, which AQE
        // exchange reuse materializes once (both branches' subtrees are
        // alias-identical below the Exchange), and `dang DIV n` replays
        // the old driver-side `dang / n` bit-exactly (dang >= 0).
        val withDeg = ranks
          .join(outdeg, ranks("node_id") === outdeg("src"), "left")
        val contrib = withDeg.where(col("outdeg").isNotNull)
          .select(col("node_id"), expr("CAST(pr DIV outdeg AS BIGINT)").as("c"))
          .join(e, col("node_id") === e("src"))
          .select(col("dst"), col("c"))
          .union(withDeg.where(col("outdeg").isNull)
            .select(lit(null).cast("long").as("dst"), col("pr").as("c")))
        val agg = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        val dangDf = agg.where(col("dst").isNull)
          .agg(coalesce(sum(col("inflow")), lit(0L)).as("dang"))
        val prev = ranks
        ranks = nodes
          .join(agg.where(col("dst").isNotNull),
            nodes("node_id") === col("dst"), "left")
          .crossJoin(broadcast(dangDf))
          .select(nodes("node_id"),
            expr(s"CAST($base + ($dampingPct * (coalesce(inflow, 0) + " +
              s"dang DIV $n)) DIV 100 AS BIGINT)").as("pr"))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    } finally {
      e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
    }
    ranks.select(col("node_id"), col("pr").as("pr_nano"))
  }

  /**
   * Personalized PageRank (topic-sensitive PageRank, Haveliwala 2002):
   * identical power iteration to [[run]], except ALL teleport mass — the
   * (100−d)% restart AND the dangling-node mass — lands uniformly on a
   * SEED set instead of on every node. This is the trust/quality
   * propagation primitive web curation uses (TrustRank, Gyöngyi et al.
   * 2004): seed a small set of known-good hosts and let proximity in the
   * link graph rank everything else; pages unreachable from the seeds
   * decay to exactly 0 rank.
   *
   * Same integer nano-unit arithmetic as [[run]] (every division is
   * `DIV`, so each iteration replays bit-exactly in the DuckDB oracle's
   * CTE unroll). Seeds not present as graph nodes are ignored; `S` is
   * the count of seed∩nodes, and the start vector is `ONE DIV S` on
   * seeds, 0 elsewhere.
   *
   * 100 TB shape: identical per-iteration cost to [[run]] (one
   * src-co-located join + one dst agg over (id, rank) pairs). The seed
   * flag rides on the slim node table (one extra byte), and the seed set
   * itself is broadcast once — seeds are by construction small (that is
   * the point of the operator).
   */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, "need 1 <= iters <= 100")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percent")
    val ONE = 1000000000L
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      // NULL endpoints (e.g. a non-numeric id that cast to null) are not
      // nodes: drop them up front. Without this, a null-dst edge's
      // contribution would land in the fused aggregate's NULL-dst
      // sentinel and be misread as DANGLING mass (the oracle computes
      // dang from rank rows only, so results would silently diverge).
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().repartition(col("src")).persist()
    val seedIds = seeds.select(col(seedCol).cast("long").as("node_id"))
      .distinct()
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id")))
      .distinct()
      .join(broadcast(seedIds.withColumn("seed_one", lit(1L))),
        Seq("node_id"), "left")
      .select(col("node_id"),
        coalesce(col("seed_one"), lit(0L)).as("is_seed"))
      .persist()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    // |seed ∩ nodes| as a one-time driver literal (same rationale and
    // identical integer math as [[run]]'s n).
    val s = nodes.agg(coalesce(sum(col("is_seed")), lit(0L)))
      .head().getLong(0)
    if (s == 0L) {
      e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
      return nodes.select(col("node_id"), lit(0L).as("pr_nano"))
    }
    val seedBase = ((100L - dampingPct) * (ONE / s)) / 100L

    var ranks = nodes
      .select(col("node_id"), col("is_seed"),
        expr(s"CAST(CASE WHEN is_seed = 1 THEN ${ONE / s} ELSE 0 END" +
          " AS BIGINT)").as("pr"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        // Same fused single-pass shape as [[run]], including the r17
        // one-action fold: the seed-directed dangling mass rides the
        // update as a 1-row broadcast (`dang DIV s` == the old driver
        // literal, dang >= 0).
        val withDeg = ranks
          .join(outdeg, ranks("node_id") === outdeg("src"), "left")
        val contrib = withDeg.where(col("outdeg").isNotNull)
          .select(col("node_id"), expr("CAST(pr DIV outdeg AS BIGINT)").as("c"))
          .join(e, col("node_id") === e("src"))
          .select(col("dst"), col("c"))
          .union(withDeg.where(col("outdeg").isNull)
            .select(lit(null).cast("long").as("dst"), col("pr").as("c")))
        val agg = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        val dangDf = agg.where(col("dst").isNull)
          .agg(coalesce(sum(col("inflow")), lit(0L)).as("dang"))
        val prev = ranks
        ranks = nodes
          .join(agg.where(col("dst").isNotNull),
            nodes("node_id") === col("dst"), "left")
          .crossJoin(broadcast(dangDf))
          .select(nodes("node_id"), nodes("is_seed"),
            expr(s"CAST(CASE WHEN is_seed = 1 THEN $seedBase ELSE 0 END" +
              s" + ($dampingPct * (coalesce(inflow, 0) + " +
              s"CASE WHEN is_seed = 1 THEN dang DIV $s ELSE 0 END))" +
              " DIV 100 AS BIGINT)").as("pr"))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    } finally {
      e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
    }
    ranks.select(col("node_id"), col("pr").as("pr_nano"))
  }

  /**
   * Weighted PageRank (Xing & Ghorbani 2004 shape): identical power
   * iteration to [[run]] except each out-edge carries a positive integer
   * weight and a node's rank splits proportionally —
   * `contribution(src→dst) = (pr · w) DIV Σw(src)` — instead of
   * uniformly. This is host-rank over link MULTIPLICITY (how often A
   * links B), and the scored form of the graphs
   * [[Graphs.cooccurrenceEdges]] emits; on an all-weights-equal graph it
   * reduces to [[run]] up to DIV rounding order (spec-pinned on
   * weight-1 inputs).
   *
   * Integer contract: weights must be positive and `pr · w` must fit a
   * long — pr ≤ 10⁹ nano-units, so w ≤ ~10⁹ is safe; duplicate (src,
   * dst) rows pre-sum their weights. Every division is `DIV`, so the
   * oracle's CTE unroll replays each iteration bit-exactly.
   *
   * 100 TB shape: identical to [[run]] — the weighted edge table is
   * cached hash(src)-partitioned once, per round one co-located
   * contribution join + one dst-keyed aggregate over slim (id, rank)
   * pairs, ranks localCheckpoint'ed with previous blocks freed.
   */
  def runWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, "need 1 <= iters <= 100")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percent")
    val ONE = 1000000000L
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      // same NULL-endpoint exclusion as [[run]] — see the note there
      .where(col("src").isNotNull && col("dst").isNotNull && col("w") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id")))
      .distinct().persist()
    val outw = e.groupBy(col("src"))
      .agg(sum(col("w")).as("wsum")).persist()
    // One-time driver literal + fused dangling pass — see [[run]].
    val n = nodes.count()
    if (n == 0L) {
      e.unpersist(false); nodes.unpersist(false); outw.unpersist(false)
      return nodes.select(col("node_id"), lit(0L).as("pr_nano"))
    }
    val base = ((100L - dampingPct) * (ONE / n)) / 100L

    var ranks = nodes
      .select(col("node_id"), lit(ONE / n).as("pr"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        // r17 one-action fold — see [[run]].
        val withW = ranks
          .join(outw, ranks("node_id") === outw("src"), "left")
        val contrib = withW.where(col("wsum").isNotNull)
          .select(col("node_id"), col("pr"), col("wsum"))
          .join(e, col("node_id") === e("src"))
          .select(col("dst"),
            expr("CAST((pr * w) DIV wsum AS BIGINT)").as("c"))
          .union(withW.where(col("wsum").isNull)
            .select(lit(null).cast("long").as("dst"), col("pr").as("c")))
        val agg = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        val dangDf = agg.where(col("dst").isNull)
          .agg(coalesce(sum(col("inflow")), lit(0L)).as("dang"))
        val prev = ranks
        ranks = nodes
          .join(agg.where(col("dst").isNotNull),
            nodes("node_id") === col("dst"), "left")
          .crossJoin(broadcast(dangDf))
          .select(nodes("node_id"),
            expr(s"CAST($base + ($dampingPct * (coalesce(inflow, 0) + " +
              s"dang DIV $n)) DIV 100 AS BIGINT)").as("pr"))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    } finally {
      e.unpersist(false); nodes.unpersist(false); outw.unpersist(false)
    }
    ranks.select(col("node_id"), col("pr").as("pr_nano"))
  }
}
