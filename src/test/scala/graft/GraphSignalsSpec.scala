package graft

import graft.operators.{Hits, Pagerank}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Personalized PageRank + HITS — the round-7 graph-signal additions.
 *  Each is checked against an in-memory integer replica of the exact
 *  arithmetic the operator (and its DuckDB oracle unroll) performs. */
class GraphSignalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val ONE = 1000000000L

  // ---- personalized PageRank -------------------------------------------

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int = 5): Map[Long, Long] =
    Pagerank.personalized(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("id"), "id", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def pprReference(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val seedSet = seeds.toSet.intersect(nodes.toSet)
    val s = seedSet.size.toLong
    val outdeg = e.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    def tele(v: Long): Long = if (seedSet(v)) ONE / s else 0L
    var pr = nodes.map(v => v -> tele(v)).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outdeg.contains).map(pr).sum
      val inflow = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (u, _) => pr(u) / outdeg(u) }.sum
      }
      pr = nodes.map { v =>
        val dangShare = if (seedSet(v)) dang / s else 0L
        v -> ((15L * tele(v)) / 100L +
          (85L * (inflow.getOrElse(v, 0L) + dangShare)) / 100L)
      }.toMap
    }
    pr
  }

  test("ppr matches the integer reference on a graph with dangling nodes") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val seeds = Seq(1L, 2L)
    assert(ppr(edges, seeds) == pprReference(edges, seeds, 5))
  }

  test("ppr: nodes unreachable from the seeds decay to zero rank") {
    // two disjoint cycles; seeds only in the first
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val r = ppr(edges, Seq(1L), iters = 10)
    assert(r(10L) == 0L && r(11L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
  }

  test("ppr: seeds outside the graph are ignored") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assert(ppr(edges, Seq(1L, 999L)) == ppr(edges, Seq(1L)))
  }

  test("ppr: all-nodes seed set ranks like uniform teleport") {
    // with every node seeded, personalization degrades to plain PageRank
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val nodes = Seq(1L, 2L, 3L)
    val plain = Pagerank.run(edges.toDF("src", "dst"), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr(edges, nodes) == plain)
  }

  test("ppr is rerun-deterministic") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(ppr(edges, Seq(2L)) == ppr(edges, Seq(2L)))
  }

  // ---- HITS ------------------------------------------------------------

  private def hits(edges: Seq[(Long, Long)],
      iters: Int = 5): Map[Long, (Long, Long)] =
    Hits.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def hitsReference(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var h = nodes.map(_ -> BigInt(ONE)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to iters) {
      val aRaw = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => h(x._1)).sum }
      val aS = aRaw.values.sum.max(BigInt(1))
      a = nodes.map(v =>
        v -> aRaw.getOrElse(v, BigInt(0)) * ONE / aS).toMap
      val hRaw = e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => a(x._2)).sum }
      val hS = hRaw.values.sum.max(BigInt(1))
      h = nodes.map(v =>
        v -> hRaw.getOrElse(v, BigInt(0)) * ONE / hS).toMap
    }
    nodes.map(v => v -> ((h(v).toLong, a(v).toLong))).toMap
  }

  test("hits matches the integer reference on a bipartite-ish graph") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L), (10L, 11L))
    assert(hits(edges) == hitsReference(edges, 5))
  }

  test("hits: the most-pointed-at node has the top authority score") {
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 8L))
    val r = hits(edges)
    assert(r(9L)._2 > r(8L)._2)
    assert(r(9L)._2 > r(1L)._2)
  }

  test("hits: a node linking to every authority is the top hub") {
    val edges = Seq((1L, 8L), (1L, 9L), (2L, 9L), (3L, 7L))
    val r = hits(edges)
    assert(r(1L)._1 > r(2L)._1 && r(1L)._1 > r(3L)._1)
  }

  test("hits: pure sources have zero authority, pure sinks zero hub") {
    val edges = Seq((1L, 10L), (2L, 10L))
    val r = hits(edges)
    assert(r(1L)._2 == 0L && r(2L)._2 == 0L)
    assert(r(10L)._1 == 0L)
  }

  test("lens file drives ppr and hits end-to-end (builtin:ppr / builtin:hits)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    Seq(2L).toDF("node_id").createOrReplaceTempView("graft_test_seeds")
    val viaLens = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:ppr",
        |  "arguments":{"seed_table":"graft_test_seeds","iters":"3"}}]}""".stripMargin)
      .forward(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLens == ppr(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)),
      Seq(2L), iters = 3))
    val hitsLens = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:hits","arguments":{"iters":"2"}}]}""")
      .forward(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hitsLens == hits(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)),
      iters = 2))
  }

  test("hits is rerun-deterministic and duplicate-edge-invariant") {
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val e2 = e1 ++ Seq((1L, 2L), (1L, 3L))
    assert(hits(e1) == hits(e1))
    assert(hits(e1) == hits(e2))
  }

  // ---- triangles + label propagation -----------------------------------

  import graft.operators.Graphs

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Brute-force reference: every unordered triple with all three edges. */
  private def triBrute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("triangleCounts: K4 gives 3 per node; adding a pendant changes nothing") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triangles(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(triangles(k4 :+ ((4L, 9L))) == triangles(k4))
    // triangle-free graphs produce an empty result
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Map.empty)
  }

  test("triangleCounts: equals brute force on a pseudorandom graph, " +
      "robust to duplicates / reversed edges / self-loops") {
    val raw = (1 to 120).map { i =>
      val a = (i * 2654435761L % 13) + 1
      val b = (i * 40503L % 13) + 1
      (a, b)
    }
    val noisy = raw ++ raw.map(_.swap) ++ Seq((5L, 5L))
    assert(triangles(noisy) == triBrute(raw))
  }

  test("labelPropagation: two cliques with a weak bridge resolve to two " +
      "communities labeled by their smallest member") {
    // cliques {1,2,3} and {10,11,12} with heavy internal edges, one
    // weight-1 bridge 3–10.
    val heavy = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).map { case (u, v) => (u, v, 5L) }
    val edges = (heavy :+ ((3L, 10L, 1L))).toDF("u", "v", "w")
    val out = Graphs.labelPropagation(edges, "u", "v", "w", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(1L) != out(10L))
  }

  test("labelPropagation: input normalization — self-loops cannot vote, " +
      "reversed duplicates merge by summing") {
    // self-loop (3,3,10) must not let node 3 vote for (and keep) its own
    // label against the real neighbor — without normalization the doubled
    // weight-20 self-vote beats the weight-4 edge and 3 stays labeled 3.
    val loop = Seq((1L, 2L, 5L), (2L, 3L, 4L), (3L, 3L, 10L))
      .toDF("u", "v", "w")
    val out = Graphs.labelPropagation(loop, "u", "v", "w", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(out(3L) != 3L)
    // (1,9,1)+(9,1,1) must behave as a single weight-2 edge: with a
    // competing (2,9,2) edge the tie-break goes to label 1 only if the
    // reversed pair summed.
    val dup = Seq((1L, 9L, 1L), (9L, 1L, 1L), (2L, 9L, 2L))
      .toDF("u", "v", "w")
    val d = Graphs.labelPropagation(dup, "u", "v", "w", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(d(9L) == 1L) // 2 vs 2 tie -> smallest label; unsummed would be 2
  }

  test("labelPropagation: deterministic tie-break adopts the smallest label") {
    // node 9 sees labels 1 and 2 at equal weight -> picks 1.
    val edges = Seq((1L, 9L, 2L), (2L, 9L, 2L)).toDF("u", "v", "w")
    val out = Graphs.labelPropagation(edges, "u", "v", "w", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(out(9L) == 1L)
  }

  test("bfsDistances: hop labels are exact min distances; hop budget " +
      "truncates; isolated seeds keep dist 0") {
    // path 1-2-3-4-5, seed {1}; node 9 is an isolated seed.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def run(hops: Int, seeds: Seq[Long]) =
      Graphs.bfsDistances(path, "a", "b",
          seeds.toDF("node_id"), "node_id", maxHops = hops)
        .as[(Long, Long)].collect().toMap
    assert(run(4, Seq(1L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(run(2, Seq(1L)) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // two seeds: distance is the min over sources
    assert(run(4, Seq(1L, 5L)) ==
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    assert(run(1, Seq(9L)) == Map(9L -> 0L))
  }

  test("lens file drives bfs end-to-end (builtin:bfs, seed catalog view)") {
    import graft.engine.Pipeline
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    Seq(1L).toDF("node_id").createOrReplaceTempView("graft_bfs_seeds")
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:bfs",
        |  "arguments":{"seed_table":"graft_bfs_seeds","max_hops":"2"}}]}"""
        .stripMargin)
      .forward(path).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("kCore: pendant chain peels away, the clique core survives with " +
      "its in-core degrees; lens-reachable") {
    import graft.engine.Pipeline
    // K4 {1..4} plus a chain 4-5-6: 2-core = the K4 (chain peels in 2
    // rounds: 6 first, then 5).
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val out = Graphs.kCore(edges, "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree empties the graph
    assert(Graphs.kCore(edges, "a", "b", k = 9, rounds = 2).count() == 0L)
    // one round peels only the first fringe layer (6 gone, 5 still in)
    val r1 = Graphs.kCore(edges, "a", "b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.contains(5L) && !r1.contains(6L))
    val lens = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:kcore",
        |  "arguments":{"a":"a","b":"b","k":"2","rounds":"3"}}]}""".stripMargin)
      .forward(edges).as[(Long, Long)].collect().toMap
    assert(lens == out)
  }

  test("linkPrediction: square graph scores both diagonals, never " +
      "existing edges; k cuts deterministically") {
    // square 1-2-3-4-1: non-adjacent pairs are the diagonals (1,3),(2,4),
    // each with cn=2 and pa=4; all existing edges excluded.
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val out = Graphs.linkPrediction(sq, "a", "b", k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 2L, 4L), (2L, 4L, 2L, 4L)))
    // path 1-2-3: one candidate (1,3), cn=1, pa=1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = Graphs.linkPrediction(path, "a", "b", k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(p == Seq((1L, 3L, 1L, 1L)))
    // k=1 keeps the (cn, pa, a, b)-first candidate
    val k1 = Graphs.linkPrediction(sq, "a", "b", k = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(k1 == Seq((1L, 3L, 2L, 4L)))
  }

  test("lens files drive cooccur_edges -> triangles and label_prop " +
      "end-to-end") {
    import graft.engine.Pipeline
    // 3 entities sharing one cell -> K3 -> one triangle (1 per node).
    val df = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"))
      .toDF("id", "cell")
    val tri = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:cooccur_edges",
        |   "arguments":{"id":"id","cells":["cell"]}},
        |  {"path":"builtin:triangles","arguments":{"a":"u","b":"v"}}
        |]}""".stripMargin)
      .forward(df).as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    val edges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
      .toDF("u", "v", "w")
    val lpa = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:label_prop",
        |  "arguments":{"iters":"2"}}]}""".stripMargin)
      .forward(edges).as[(Long, Long)].collect().toMap
    assert(lpa.values.toSet.size == 1)
  }

  test("cooccurrenceEdges: pair weight counts DISTINCT shared cells and " +
      "the threshold prunes") {
    val df = Seq(
      (1L, "x", 0L), (1L, "x", 0L), (1L, "y", 1L), (1L, "z", 2L),
      (2L, "x", 0L), (2L, "y", 1L), (2L, "z", 2L),
      (3L, "x", 0L)).toDF("id", "t", "cell")
    val all = Graphs.cooccurrenceEdges(df, "id", Seq("t", "cell"), 1L)
      .as[(Long, Long, Long)].collect().toSet
    // duplicate (1,x,0) row must not inflate the weight
    assert(all == Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val strong = Graphs.cooccurrenceEdges(df, "id", Seq("t", "cell"), 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(strong == Set((1L, 2L, 3L)))
  }

  // ---- skew defenses: hot-cell / hub caps + salted enumeration ----------

  test("cooccurrenceEdges: salted triangle equals the plain join and " +
      "maxCellEntities drops exactly the hot cells") {
    // one hot cell with 40 entities, one small cell reusing 3 of them
    val rows = (1L to 40L).map(i => (i, "hot")) ++
      Seq((1L, "small"), (2L, "small"), (3L, "small"))
    val df = rows.toDF("id", "cell")
    val plain = Graphs.cooccurrenceEdges(df, "id", Seq("cell"), 1L,
      saltBuckets = 1).as[(Long, Long, Long)].collect().toSet
    val salted = Graphs.cooccurrenceEdges(df, "id", Seq("cell"), 1L,
      saltBuckets = 8).as[(Long, Long, Long)].collect().toSet
    assert(salted == plain, "salted enumeration diverged from plain join")
    assert(plain.size == 40 * 39 / 2, "expected all hot-cell pairs")
    // cap below the hot cell's 40 entities: only the small cell pairs
    val capped = Graphs.cooccurrenceEdges(df, "id", Seq("cell"), 1L,
      maxCellEntities = 8L).as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("cooccurrenceEdges: a hot cell's C(k,2) pair loop spreads across " +
      "salt sub-cells instead of one task") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val s = 8
    val n = 64L
    val df = (1L to n).map(i => (i, "hot")).toDF("id", "cell")
    // replicate the operator's salt assignment and measure the per
    // (sa, sb) sub-cell pair load the triangle join produces
    val salts = df.select(col("id"),
        pmod(xxhash64(col("id")), lit(s)).cast("int").as("salt"))
      .as[(Long, Int)].collect().toMap
    val loads = (1L to n).flatMap(a => (a + 1 to n).map { b =>
      (math.min(salts(a), salts(b)), math.max(salts(a), salts(b)))
    }).groupBy(identity).map(_._2.size)
    val total = (n * (n - 1) / 2).toInt
    assert(loads.sum == total, "every pair must land in exactly one cell")
    assert(loads.size >= s * (s + 1) / 2 - 4,
      s"only ${loads.size} of ${s * (s + 1) / 2} sub-cells occupied")
    assert(loads.max <= total / 6,
      s"one sub-cell owns ${loads.max} of $total pairs — not spread")
  }

  test("resourceAllocation: hub centers discounted 1/deg, selective " +
      "centers dominate; salted == plain") {
    // pair (2,4): shares selective center 3 (deg 2 -> 500000 units).
    // pair (5,6): shares hub center 1 (deg 4 -> 250000 units). Raw CN
    // ties at 1; RA ranks (2,4) above (5,6).
    val edges = Seq((2L, 3L), (3L, 4L), (1L, 5L), (1L, 6L), (1L, 2L),
      (1L, 4L)).toDF("a", "b")
    val out = Graphs.resourceAllocation(edges, "a", "b", k = 100,
        saltBuckets = 1)
      .as[(Long, Long, Long, Long)].collect()
    val byPair = out.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // (2,4) shares hub 1 AND selective 3: cn=2, ra = 250000 + 500000
    assert(byPair((2L, 4L)) == ((2L, 750000L)))
    assert(byPair((5L, 6L)) == ((1L, 250000L)))
    // (1,3) shares TWO selective centers (2 and 4, deg 2 each): ra =
    // 1000000 — RA ranks it above (2,4) even though their cn ties at 2
    assert(byPair((1L, 3L)) == ((2L, 1000000L)))
    assert(out.head._1 == 1L && out.head._2 == 3L)
    val salted = Graphs.resourceAllocation(edges, "a", "b", k = 100)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(salted == out.toSet, "salted RA diverged from plain")
  }

  test("resourceAllocation: exact top-k early-prune is LOSSLESS on a " +
      "sparse graph where theta actually drops leaves - pruned output " +
      "is bit-identical to the unpruned pass, including theta-ties") {
    // a complete-bipartite core (8 centers x 8 leaves: every core pair
    // shares 8 deg-8 counterparts -> 2*C(8,2)=56 valid seed pairs, all
    // scoring 8*(1e6 div 8) = 1e6) plus 60 'fringe' stars. With the
    // deg>=2 center filter (r11 advice) fringe hubs have potential 0
    // (their only centers are deg-1 leaves, excluded) and fringe
    // leaves have 1e6 div 3 = 333k << theta=1e6 - so topm(16) is
    // exactly the 16 core nodes, the seed pass finds 56 >= k pairs,
    // theta lands at 1e6, and the keep filter ACTUALLY drops all 240
    // fringe nodes. (Two prior fixtures were vacuous: r11's produced
    // 6 seed pairs < k, and the first rewrite let deg-1 leaves inflate
    // fringe-hub potentials to 3e6, crowding the seed with 16 disjoint
    // stars -> 0 seed pairs. lastRaTheta now pins engagement.)
    val core = for (c <- 100L to 107L; x <- 1L to 8L) yield (c, x)
    val fringe = for (h <- 200L until 260L; x <- 0L until 3L)
      yield (h, 1000L + h * 10 + x)
    val edges = (core ++ fringe).toDF("a", "b")
    val k = 10
    val unpruned = Graphs.resourceAllocation(edges, "a", "b", k = k,
      saltBuckets = 1, pruneSeed = 0)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(Graphs.lastRaTheta == 0L, "pruneSeed=0 must skip the prune")
    val pruned = Graphs.resourceAllocation(edges, "a", "b", k = k,
      saltBuckets = 1, pruneSeed = 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(Graphs.lastRaTheta == 1000000L,
      s"prune did not engage: theta=${Graphs.lastRaTheta} (expected " +
        "1e6 from 56 all-1e6 core seed pairs; 0 = vacuous fallback)")
    assert(pruned == unpruned,
      "theta prune changed the top-k (must be bit-identical, same order)")
    assert(unpruned.size == k)
    // prune with a seed too small to find k valid pairs falls back to
    // the full pass (theta = 0), still identical
    val tiny = Graphs.resourceAllocation(edges, "a", "b", k = k,
      saltBuckets = 1, pruneSeed = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(Graphs.lastRaTheta == 0L,
      "2-node seed yields 1 valid pair < k; theta must fall back to 0")
    assert(tiny == unpruned, "tiny-seed fallback diverged")
  }

  test("linkPrediction: salted wedge equals plain; maxCenterDegree drops " +
      "hub centers while pa keeps TRUE degrees") {
    // path 1-2-3 plus hub 100 over {1,4,5,6}: hub degree 4
    val edges = Seq((1L, 2L), (2L, 3L), (100L, 1L), (100L, 4L),
      (100L, 5L), (100L, 6L)).toDF("a", "b")
    val plain = Graphs.linkPrediction(edges, "a", "b", k = 100,
      saltBuckets = 1).as[(Long, Long, Long, Long)].collect().toSet
    val salted = Graphs.linkPrediction(edges, "a", "b", k = 100)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(salted == plain, "salted wedge diverged from plain join")
    // cap 3 < deg(100)=4: the hub's 6 leaf-pair wedges vanish; the two
    // surviving candidates come from centers 1 and 2, and their pa still
    // uses TRUE degrees — deg(1)=2 includes the hub edge, deg(100)=4.
    val capped = Graphs.linkPrediction(edges, "a", "b", k = 100,
        maxCenterDegree = 3L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 3L, 1L, 2L), (2L, 100L, 1L, 8L)))
    assert(plain.map(p => (p._1, p._2)).contains((4L, 5L)) &&
      !capped.map(p => (p._1, p._2)).contains((4L, 5L)),
      "cap failed to drop hub-centered wedges")
  }
}
