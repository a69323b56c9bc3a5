package graft.operators

import org.apache.spark.sql.{functions => F, DataFrame}

/**
 * Redirect-chain resolution over a crawl's 3xx edge list — the
 * post-fetch step every crawl consumer runs before dedup/host-rank:
 * collapse `src → Location` hops to the FINAL landing url, flagging
 * chains that never land (cycles, self-loops, or chains past the hop
 * budget — all real: redirect loops are a standard crawler trap).
 *
 * Algorithm: POINTER DOUBLING (path halving), not per-hop stepping —
 * ceil(log2(maxHops)) self-joins instead of maxHops, so a 32-hop
 * budget costs 5 rounds. Each round joins the frontier map to itself
 * on the current-target key and composes jumps; rows that reached a
 * terminal (a url with no outgoing edge) freeze with their exact hop
 * count. After the last round, anything still moving is unresolved —
 * a cycle can never terminate, so loop detection falls out of the hop
 * budget with no cycle-finding pass.
 *
 * 100 TB shape: every round shuffles one slim (url, cur, hops, done)
 * row per REDIRECT SOURCE (never per page — pages that don't redirect
 * never enter), url-keyed; log-bounded rounds, each behind a
 * `localCheckpoint` so the lineage doesn't stack (the PageRank-style
 * iteration discipline). No broadcast hints — AQE sizes the joins.
 *
 * Reference has no crawl surface (north-star addition; the fetch-side
 * complement of `StreamingLens.frontierAdmit`'s politeness loop).
 */
object Redirects {

  /** Resolve every `srcCol → dstCol` chain to its final url within
   *  `maxHops`. Output: (src, final_url, hops, resolved) — unresolved
   *  rows (cycle or budget) carry final_url = "" and hops = -1.
   *  Multiple captured Locations for one src collapse to the
   *  lexicographic min (deterministic). `resolved` is exact against
   *  the hop budget: doubling may internally overshoot to the next
   *  power of two, but chains longer than `maxHops` report
   *  unresolved. */
  def resolve(edges: DataFrame, maxHops: Int = 32,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 1024,
      s"resolve: maxHops $maxHops outside [1, 1024]")
    val once = edges
      .select(F.col(srcCol).cast("string").as("u"),
        F.col(dstCol).cast("string").as("v"))
      .groupBy("u").agg(F.min("v").as("v"))
    val hasOut = once.select(F.col("u").as("k"))
    var m = once.join(hasOut, once("v") === hasOut("k"), "left")
      .select(F.col("u"), F.col("v").as("cur"), F.lit(1L).as("hops"),
        F.col("k").isNull.as("done"))
      .localCheckpoint()
    val rounds =
      if (maxHops <= 1) 0
      else 32 - Integer.numberOfLeadingZeros(maxHops - 1)
    var k = 0
    while (k < rounds) {
      val hop = m.select(F.col("u").as("ju"), F.col("cur").as("jcur"),
        F.col("hops").as("jhops"), F.col("done").as("jdone"))
      // a !done row's cur has an outgoing edge by construction, so the
      // left join only leaves nulls on frozen rows
      m = m.join(hop, m("cur") === hop("ju") && !m("done"), "left")
        .select(
          F.col("u"),
          F.when(F.col("done"), F.col("cur"))
            .otherwise(F.col("jcur")).as("cur"),
          F.when(F.col("done"), F.col("hops"))
            .otherwise(F.col("hops") + F.col("jhops")).as("hops"),
          (F.col("done") || F.col("jdone")).as("done"))
        .localCheckpoint()
      k += 1
    }
    val landed = F.col("done") && F.col("hops") <= maxHops
    m.select(
      F.col("u").as(srcCol),
      F.when(landed, F.col("cur")).otherwise(F.lit("")).as("final_url"),
      F.when(landed, F.col("hops")).otherwise(F.lit(-1L)).as("hops"),
      landed.as("resolved"))
  }
}
