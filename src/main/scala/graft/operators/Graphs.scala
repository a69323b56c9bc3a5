package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Undirected-graph analytics beyond the spectral family
 * ([[Pagerank]]/[[Hits]]): co-occurrence graph construction, exact
 * triangle counting, and deterministic label-propagation communities.
 * Together they cover the "affinity structure" questions a curation
 * pipeline asks of its entity graphs (user co-activity, supplier
 * co-shipment, near-dup doc adjacency): how clustered is the
 * neighborhood (triangles → local clustering), and what are the
 * communities (LPA — the cheap non-iterative-matrix alternative to
 * spectral methods).
 *
 * Everything is integer-exact and RNG-free, so a SQL oracle replays
 * every output row: triangle counting is plain joins; LPA is made
 * deterministic by the (weight desc, label asc) argmax tie-break and a
 * FIXED iteration count (classic async LPA is order-dependent by
 * design; the sync+tie-broken variant trades a little convergence speed
 * for bit-exact replayability — same trade every operator here makes).
 *
 * reference: no graph layer in lens (items are independent JSON docs —
 * host-go/engine/pipes/fromSource.go); these are §2.6 north-star
 * additions alongside [[Pagerank]].
 */
object Graphs {

  /**
   * Test-only introspection: the θ chosen by the last
   * [[resourceAllocation]] call on this JVM (0 = no-prune fallback,
   * -1 = never ran). Lets specs assert the keep-filter path actually
   * engaged instead of silently regressing to the fallback.
   */
  @volatile private[graft] var lastRaTheta: Long = -1L

  /** Free the blocks behind a localCheckpoint'ed round (same hygiene as
   *  [[Pagerank]] — lineage is one round deep, previous rounds' blocks
   *  must not accumulate across iterations). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** Canonical undirected simple-graph normalization shared by every
   *  operator here: (min, max) endpoint order, self-loops dropped,
   *  duplicate/reversed rows collapsed. One definition so the ops cannot
   *  drift on graph semantics. */
  private def canonicalEdges(edges: DataFrame, aCol: String,
      bCol: String): DataFrame =
    edges.select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()

  /**
   * Co-occurrence projection of a bipartite (entity, cell) relation:
   * entities sharing at least `minWeight` distinct cells become an
   * undirected weighted edge (u < v, w = #shared cells). This is how
   * entity graphs are BUILT from event logs and corpora — user
   * co-activity (cells = type×hour), supplier co-shipment (cells =
   * parts), doc adjacency (cells = shingle buckets).
   *
   * 100 TB shape: the input collapses to DISTINCT (entity, cell) FIRST
   * (cost drops from event volume to |entities×active cells|), then the
   * pair join is keyed on the cell — per-cell fanout is C(k,2) for k
   * entities in the cell, the same bounded-block structure the dedup
   * family uses. Two enforced skew defenses (not just documented):
   * `maxCellEntities` DROPS pathological cells outright (one hour where
   * everyone is active carries no pairwise signal — the graph analogue
   * of stopword removal; mirror the cap in any SQL oracle), and the
   * remaining per-cell C(k,2) enumeration runs as the [[SkewJoin]]
   * salted triangle — each cell's pair space splits into S(S+1)/2
   * (sa, sb) sub-cells keyed by a per-entity hash salt, so even the
   * largest surviving cell spreads across the cluster instead of
   * serializing its pair loop on one task. `saltBuckets = 1`
   * degenerates to the plain per-cell join (exactness spec'd both
   * ways). The weight aggregate and threshold shuffle only (u, v) pairs.
   */
  def cooccurrenceEdges(df: DataFrame, idCol: String,
      cellCols: Seq[String], minWeight: Long = 1L,
      maxCellEntities: Long = Long.MaxValue,
      saltBuckets: Int = 8): DataFrame = {
    require(cellCols.nonEmpty, "need at least one cell column")
    require(maxCellEntities >= 2, "a cell needs >= 2 entities to pair")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val d0 = df.select(col(idCol) +: cellCols.map(col): _*).distinct()
    val d =
      if (maxCellEntities == Long.MaxValue) d0
      else d0.join(
        d0.groupBy(cellCols.map(col): _*)
          .agg(count(lit(1)).as("__k"))
          .where(col("__k") <= maxCellEntities)
          .select(cellCols.map(col): _*),
        cellCols, "left_semi")
    // Salted-triangle pair enumeration (the Dedup.embeddingCosine
    // decomposition): left carries (salt, sb >= salt), right
    // (sa <= salt, salt); each unordered pair meets in exactly one
    // (cell, sa, sb) sub-cell, diagonals deduped by the id filter.
    //
    // saltBuckets == 1 takes a structurally reduced path, not just a
    // degenerate constant: at S = 1 every salt is 0, both explodes emit
    // exactly one row, and the (sa < sb) arm of the pair filter is
    // vacuous — so the salt columns, the xxhash64, and the two Generate
    // operators are pure overhead AND (the real cost) they make the two
    // join inputs canonically DIFFERENT subtrees (sequence(salt, 0) vs
    // sequence(0, salt)), which defeats ReuseExchange: the whole
    // distinct+cap lineage under `d` executed once per side. Alias-only
    // projections restore one shared Exchange. Output-identical (the
    // filter reduces to ida < idb on the same candidate set).
    val paired =
      if (saltBuckets == 1) {
        val left = d.select(col(idCol).as("__ida") +: cellCols.map(col): _*)
        val right = d.select(col(idCol).as("__idb") +: cellCols.map(col): _*)
        left.join(right, cellCols)
          .where(col("__ida") < col("__idb"))
      } else {
        val base = d.withColumn("__salt",
          pmod(xxhash64(col(idCol)), lit(saltBuckets)).cast("int"))
        val left = base
          .withColumn("__sb", explode(expr(s"sequence(__salt, ${saltBuckets - 1})")))
          .select(col(idCol).as("__ida") +: cellCols.map(col) :+
            col("__salt").as("__sa") :+ col("__sb"): _*)
        val right = base
          .withColumn("__sa", explode(expr("sequence(0, __salt)")))
          .select(col(idCol).as("__idb") +: cellCols.map(col) :+
            col("__sa") :+ col("__salt").as("__sb"): _*)
        left.join(right, cellCols ++ Seq("__sa", "__sb"))
          .where(col("__sa") < col("__sb") || col("__ida") < col("__idb"))
      }
    // pair-keyed repartition before the weight aggregate: cell-keyed
    // partial aggregation would build near-|pairs|-sized maps per task
    // for a ~1.7× row reduction; pair-partitioned, both agg maps stay
    // small and on the codegen fast-map path (the resourceAllocation
    // wedge measurement, same shape)
    paired
      .select(least(col("__ida"), col("__idb")).as("u"),
        greatest(col("__ida"), col("__idb")).as("v"))
      .repartition(col("u"), col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minWeight)
  }

  /**
   * Exact per-node triangle counts of an undirected simple graph
   * (self-loops and duplicate/reversed edges normalized away). Output:
   * (node_id, n_triangles) for every node in at least one triangle.
   *
   * Algorithm: degree orientation (Schank & Wagner 2005 / Suri &
   * Vassilvitskii 2011 MR-triangles) — orient every edge from the
   * endpoint with smaller (degree, id) to the larger, enumerate wedges
   * only from each vertex's ORIENTED out-neighbors, and close them
   * against the edge set. Every triangle has exactly one minimum-rank
   * vertex, so each is found exactly once.
   *
   * 100 TB shape: the orientation is the whole point — out-degree under
   * it is O(√m) even on power-law graphs, so the wedge self-join costs
   * Σ d⁺(v)² = O(m^1.5) instead of the Σ d(v)² blowup a hub vertex
   * causes unoriented. Three shuffles of slim id tuples: the wedge
   * build keyed on the pivot, the closure semi-join keyed on the
   * (b, c) pair, and the final per-node count. Nothing corpus-shaped
   * moves; the degree table is |V| rows.
   */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // und is referenced three times (degrees, orientation, closure) —
    // checkpoint so an expensive edge-construction lineage (e.g. the
    // cooccurrenceEdges self-join) executes once, not per reference
    // (the Clusters.addEdges lesson; measured 8 s of a 12 s query).
    val und = canonicalEdges(edges, aCol, bCol).localCheckpoint()
    val deg = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val du = deg.select(col("x").as("u"), col("d").as("du"))
    val dv = deg.select(col("x").as("v"), col("d").as("dv"))
    val ranked = und.join(du, "u").join(dv, "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = ranked.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"))
    val o1 = oriented.as("o1"); val o2 = oriented.as("o2")
    // wedge (b, c) canonicalized by id so it joins the (u < v) edge set
    val wedges = o1.join(o2,
        col("o1.s") === col("o2.s") && col("o1.t") < col("o2.t"))
      .select(col("o1.s").as("a"),
        col("o1.t").as("b"), col("o2.t").as("c"))
    val tri = wedges.join(und,
      wedges("b") === und("u") && wedges("c") === und("v"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy(col("node_id"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /**
   * k-core peeling (Seidman 1983): repeatedly delete nodes with degree
   * < k; what survives is the k-core — the "dense backbone" membership
   * signal spam/quality graph analysis uses (core number correlates
   * with authority; fringe nodes peel off early). A FIXED `rounds`
   * budget instead of an until-stable loop keeps the output a pure
   * function of the edge set (each peel is deterministic, so `rounds`
   * that reach the fixpoint give the true k-core; the oracle unrolls
   * the same rounds either way — equality holds converged or not).
   * Output: (node_id, deg) — surviving nodes with their degree in the
   * surviving subgraph.
   *
   * 100 TB shape: per round one degree aggregate over slim (x, n) pairs
   * and two semi-joins of the edge set against the survivor table —
   * nothing but id pairs ever shuffles, and the edge set only SHRINKS.
   * Rounds are localCheckpoint'ed with previous blocks freed (the
   * [[Pagerank]] discipline), so lineage stays one round deep.
   */
  def kCore(edges: DataFrame, uCol: String, vCol: String,
      k: Int, rounds: Int = 5): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 50,
      "need k >= 1, 1 <= rounds <= 50")
    def adjacency(e: DataFrame): DataFrame =
      e.select(col("u").as("x")).union(e.select(col("v").as("x")))
    var e = canonicalEdges(edges, uCol, vCol).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = adjacency(e).groupBy(col("x"))
        .agg(count(lit(1)).as("d")).where(col("d") >= k)
        .select(col("x"))
      val prev = e
      e = e.join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("x").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      unpersistCheckpoint(prev)
    }
    adjacency(e).groupBy(col("x").as("node_id"))
      .agg(count(lit(1)).cast("long").as("deg"))
  }

  /**
   * Multi-source BFS — hop distance from a seed set, bounded at
   * `maxHops`: the reachability/influence-radius primitive ("how far is
   * every user from a converter", "which hosts sit within 2 links of a
   * trusted seed"), and the hard-threshold sibling of
   * [[Pagerank.personalized]]'s soft proximity. Output: (node_id, dist)
   * for seeds (0) and every node reached within the budget; unreached
   * nodes are absent. Deterministic: distance is a pure min over the
   * edge set.
   *
   * 100 TB shape: frontier expansion — per hop one join of the
   * adjacency against the CURRENT distance table, an anti-join against
   * everything already labeled, and a union; only (id, dist) pairs
   * shuffle and each hop is localCheckpoint'ed with previous blocks
   * freed. Work per hop is proportional to edges incident to the
   * frontier, the textbook BSP/Pregel BFS cost.
   */
  def bfsDistances(edges: DataFrame, uCol: String, vCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1 && maxHops <= 50, "need 1 <= maxHops <= 50")
    val und = canonicalEdges(edges, uCol, vCol)
    val adj = und
      .union(und.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u")).persist()
    var dist = seeds.select(col(seedCol).cast("long").as("node_id"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint()
    try {
      for (h <- 1 to maxHops) {
        val reached = adj.join(dist.where(col("dist") === (h - 1)),
            adj("u") === col("node_id"))
          .select(adj("v").as("node_id")).distinct()
          .join(dist, Seq("node_id"), "left_anti")
          .withColumn("dist", lit(h.toLong))
        val prev = dist
        dist = dist.union(reached).localCheckpoint()
        unpersistCheckpoint(prev)
      }
    } finally {
      adj.unpersist(false)
    }
    dist
  }

  /**
   * Link prediction by neighborhood overlap (Liben-Nowell & Kleinberg
   * 2003): for every NON-adjacent pair with at least one common
   * neighbor, emit the common-neighbor count and the
   * preferential-attachment product deg(a)·deg(b) — the two classic
   * integer-exact scores — cut to the top `k` by (cn desc, pa desc, a,
   * b). In a curation pipeline this is the "which entities are probably
   * the same / will interact" signal over the graphs
   * [[cooccurrenceEdges]] builds, and the integer counts are why it
   * oracle-replays where Adamic-Adar's 1/log(deg) would not.
   *
   * 100 TB shape: candidate generation is the wedge join keyed on the
   * shared neighbor — Σ deg(c)² over centers, the same envelope as
   * unoriented wedge counting (orientation can't apply: BOTH endpoints
   * of a candidate must surface). Two enforced hub defenses:
   * `maxCenterDegree` drops centers above the cap from wedge
   * ENUMERATION (capped common-neighbor counts — the standard
   * power-law approximation; a celebrity node's C(deg,2) wedges carry
   * ~no per-pair signal anyway. `pa` still uses TRUE degrees; mirror
   * the cap in any SQL oracle), and surviving centers enumerate their
   * wedges through the [[SkewJoin]] salted triangle — each center's
   * pair space splits into S(S+1)/2 (sa, sb) sub-cells keyed by a
   * per-leaf hash salt, so the largest surviving hub spreads across
   * the cluster instead of serializing on one task (`saltBuckets = 1`
   * degenerates to the plain wedge join; exactness spec'd both ways).
   * Every shuffle moves slim id pairs, the degree table is |V| rows,
   * and the final cut is a per-partition heap (TakeOrdered), never a
   * global sort.
   */
  def linkPrediction(edges: DataFrame, uCol: String, vCol: String,
      k: Int = 100, maxCenterDegree: Long = Long.MaxValue,
      saltBuckets: Int = 8): DataFrame = {
    require(maxCenterDegree >= 2, "a center needs degree >= 2 to wedge")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    // referenced four times (both wedge sides, degrees, the anti-join) —
    // same checkpoint rationale as [[triangleCounts]].
    val und = canonicalEdges(edges, uCol, vCol).localCheckpoint()
    val adj = und.select(col("u").as("x"), col("v").as("n"))
      .union(und.select(col("v").as("x"), col("u").as("n")))
    val deg = adj.groupBy(col("x")).agg(count(lit(1)).as("d"))
    val wedgeAdj =
      if (maxCenterDegree == Long.MaxValue) adj
      else adj.join(
        deg.where(col("d") <= maxCenterDegree).select(col("x").as("n")),
        Seq("n"), "left_semi")
    // Salted-triangle wedge enumeration keyed on the center (same
    // decomposition as [[cooccurrenceEdges]]): salt hashes the LEAF so
    // one hub center's neighbor list scatters over the sub-cells.
    // saltBuckets == 1 takes the structurally reduced path — no salt
    // columns, no Generate operators, and alias-identical join inputs
    // so ReuseExchange shares ONE exchange of the capped adjacency
    // between both wedge sides (see [[cooccurrenceEdges]]);
    // output-identical.
    val wedgePairs =
      if (saltBuckets == 1) {
        val l = wedgeAdj.select(col("n").as("c"), col("x").as("la"))
        val r = wedgeAdj.select(col("n").as("c"), col("x").as("lb"))
        l.join(r, Seq("c")).where(col("la") < col("lb"))
      } else {
        val base = wedgeAdj.select(col("n").as("c"), col("x").as("leaf"))
          .withColumn("__salt",
            pmod(xxhash64(col("leaf")), lit(saltBuckets)).cast("int"))
        val l = base
          .withColumn("__sb", explode(expr(s"sequence(__salt, ${saltBuckets - 1})")))
          .select(col("c"), col("leaf").as("la"),
            col("__salt").as("__sa"), col("__sb"))
        val r = base
          .withColumn("__sa", explode(expr("sequence(0, __salt)")))
          .select(col("c"), col("leaf").as("lb"),
            col("__sa"), col("__salt").as("__sb"))
        l.join(r, Seq("c", "__sa", "__sb"))
          .where(col("__sa") < col("__sb") || col("la") < col("lb"))
      }
    // pair-keyed repartition before the aggregate — same rationale and
    // measurement as [[resourceAllocation]]'s wedge pass
    val cand = wedgePairs
      .select(least(col("la"), col("lb")).as("a"),
        greatest(col("la"), col("lb")).as("b"))
      .repartition(col("a"), col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"))
    val non = cand.join(und,
        cand("a") === und("u") && cand("b") === und("v"), "left_anti")
    non
      .join(deg.select(col("x").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("x").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("cn"),
        (col("da") * col("db")).as("pa"))
      .orderBy(col("cn").desc, col("pa").desc, col("a"), col("b"))
      .limit(k)
  }

  /**
   * Resource-Allocation link prediction (Zhou, Lü & Zhang 2009) — the
   * degree-discounted sibling of [[linkPrediction]]'s raw
   * common-neighbor count: each shared neighbor z contributes 1/deg(z),
   * so a promiscuous hub vouches for a pair far less than a selective
   * mutual friend (RA beats CN on most benchmark graphs). Integer-exact
   * via the established per-term-floor discipline: each center
   * contributes `scale div deg(z)` micro-units and the SUM of floored
   * terms replays exactly cross-engine (the bigram-LM micro-nat trick).
   * Raw `cn` rides along for the tie-break; order (ra_units desc, cn
   * desc, a, b) is total.
   *
   * 100 TB shape: identical envelope to [[linkPrediction]] — capped
   * centers, salted-triangle wedge enumeration, TakeOrdered k-cut; the
   * only addition is one |E|-vs-|V| join attaching the center's
   * floored weight to the adjacency BEFORE the explode, and the weight
   * rides the l side only so each wedge contributes once.
   *
   * EXACT top-k early-prune (two-phase, provably lossless): a leaf's
   * POTENTIAL `P(x) = Σ_{c ∈ cappedCenters(x)} scale div deg(c)` upper-
   * bounds the RA score of ANY pair involving x (common centers are a
   * subset of x's centers). Phase 1 scores pairs among the top
   * `pruneSeed` leaves by potential exactly (tiny self-join) and takes
   * the k-th best valid score θ — a LOWER bound on the true k-th score
   * (a subset's k-th best can only be ≤ the full set's). Phase 2 runs
   * the full wedge pass with leaves where `P(x) < θ` dropped: every
   * true top-k pair survives because each of its leaves has
   * P ≥ score ≥ kth ≥ θ (equality kept, so θ-ties still compete on the
   * cn/a/b tie-break). Output is bit-identical to the unpruned pass;
   * the wedge volume shrinks quadratically in the kept-leaf fraction.
   * θ is ONE driver-side scalar (TakeOrdered k, min) — driver-bounded.
   *
   * `pruneSeed = 0` (the DEFAULT) disables the prune: on a dense graph
   * it is pure overhead — measured at sf0.1 on the co-activity graph
   * (1 500 nodes, avg capped degree ~168) θ kept 1 498/1 500 leaves
   * while the seed pass cost ~2 s. Enable it for sparse power-law
   * graphs where most leaves have few selective centers (P(x) far
   * below the k-th score) — the regime a 100 TB entity graph lives in.
   */
  def resourceAllocation(edges: DataFrame, uCol: String, vCol: String,
      k: Int = 100, maxCenterDegree: Long = Long.MaxValue,
      saltBuckets: Int = 8, scale: Long = 1000000L,
      pruneSeed: Int = 0): DataFrame = {
    require(maxCenterDegree >= 2, "a center needs degree >= 2 to wedge")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(pruneSeed >= 0, "pruneSeed must be >= 0")
    val und = canonicalEdges(edges, uCol, vCol).localCheckpoint()
    val adj = und.select(col("u").as("x"), col("v").as("n"))
      .union(und.select(col("v").as("x"), col("u").as("n")))
    val deg = adj.groupBy(col("x")).agg(count(lit(1)).as("d"))
    // ONE join does both jobs: the center cap (inner on the filtered
    // deg table) and the floored 1/deg weight attach. Checkpointed only
    // when the prune is on: potential, seed and main passes then all
    // reference it, and its lineage (edges + degree shuffle) must not
    // re-execute per reference; unpruned it is referenced once.
    // deg >= 2: a degree-1 center can never form a wedge (its only
    // leaf has no partner in the self-join), so dropping it here is
    // output-identical. It also tightens the prune potential P(x) —
    // on star-heavy power-law graphs degree-1 centers otherwise
    // inflate hub potentials and drive θ to 0 — and trims dead rows
    // from the wedge self-join shuffle.
    val capped0 = adj.select(col("n").as("c"), col("x").as("leaf"))
      .join(deg.where(col("d") >= 2 && col("d") <= maxCenterDegree)
        .select(col("x").as("c"), expr(s"$scale div d").as("raw")), Seq("c"))
    val capped = if (pruneSeed > 0) capped0.localCheckpoint() else capped0
    // |V|-bounded; checkpointed because the θ pass and the keep filter
    // both read it
    lazy val pot = capped.groupBy(col("leaf"))
      .agg(sum(col("raw")).as("p")).localCheckpoint()
    val theta: Long = if (pruneSeed == 0) 0L else {
      val topm = pot.orderBy(col("p").desc, col("leaf")).limit(pruneSeed)
        .select(col("leaf"))
      val seedAdj = capped.join(broadcast(topm), Seq("leaf"), "left_semi")
      val sl = seedAdj.select(col("c"), col("leaf").as("la"), col("raw"))
      val sr = seedAdj.select(col("c"), col("leaf").as("lb"))
      val seedScores = sl.join(sr, Seq("c"))
        .where(col("la") < col("lb"))
        .groupBy(col("la").as("a"), col("lb").as("b"))
        .agg(sum(col("raw")).as("ra_units"))
      val seedValid = seedScores.join(und,
          seedScores("a") === und("u") && seedScores("b") === und("v"),
          "left_anti")
        .orderBy(col("ra_units").desc).limit(k)
        .agg(count(lit(1)).as("n"), min(col("ra_units")).as("kth"))
        .collect()(0)
      if (seedValid.getLong(0) >= k) seedValid.getLong(1) else 0L
    }
    lastRaTheta = theta // test introspection: proves the prune engaged
    val kept = if (theta > 0L) {
      val keep = pot.where(col("p") >= theta).select(col("leaf"))
      capped.join(keep, Seq("leaf"), "left_semi")
    } else capped
    // saltBuckets == 1 takes the structurally reduced wedge path — no
    // salt columns, no Generate operators (see [[cooccurrenceEdges]]).
    // The sides stay canonically different regardless (only `l` carries
    // `raw`, so each wedge contributes its weight once), hence no
    // ReuseExchange either way; the win here is dropping the per-row
    // hash + explode and the two extra join key columns.
    // Output-identical (the pair filter reduces to la < lb).
    val wedgePairs =
      if (saltBuckets == 1) {
        val l = kept.select(col("c"), col("leaf").as("la"), col("raw"))
        val r = kept.select(col("c"), col("leaf").as("lb"))
        l.join(r, Seq("c")).where(col("la") < col("lb"))
      } else {
        val baseW = kept.withColumn("__salt",
          pmod(xxhash64(col("leaf")), lit(saltBuckets)).cast("int"))
        val l = baseW
          .withColumn("__sb", explode(expr(s"sequence(__salt, ${saltBuckets - 1})")))
          .select(col("c"), col("leaf").as("la"), col("raw"),
            col("__salt").as("__sa"), col("__sb"))
        val r = baseW
          .withColumn("__sa", explode(expr("sequence(0, __salt)")))
          .select(col("c"), col("leaf").as("lb"),
            col("__sa"), col("__salt").as("__sb"))
        l.join(r, Seq("c", "__sa", "__sb"))
          .where(col("__sa") < col("__sb") || col("la") < col("lb"))
      }
    // repartition by PAIR before the aggregate: wedge rows repeat a
    // pair only ~1.4× within a center-partition, so center-partitioned
    // partial aggregation builds ~|pairs|-sized maps per task (slow
    // UnsafeRow path) to save almost nothing; pair-partitioned, both
    // agg maps hold only |pairs|/numPartitions entries and stay on the
    // codegen fast-map path (measured 10.5 s → 6.9 s on the sf0.1
    // wedge stage). The shuffle moves slim (a, b, raw) triples either
    // way.
    val cand = wedgePairs
      .select(least(col("la"), col("lb")).as("a"),
        greatest(col("la"), col("lb")).as("b"), col("raw"))
      .repartition(col("a"), col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("raw")).as("ra_units"))
    cand.join(und,
        cand("a") === und("u") && cand("b") === und("v"), "left_anti")
      .select(col("a"), col("b"), col("cn"), col("ra_units"))
      .orderBy(col("ra_units").desc, col("cn").desc, col("a"), col("b"))
      .limit(k)
  }

  /**
   * Deterministic synchronous label propagation (Raghavan et al. 2007
   * made replayable): labels start as node ids; each round every node
   * adopts the label with the greatest incident edge weight among its
   * neighbors' current labels, ties broken by smallest label. A FIXED
   * `iters` rounds — no convergence test — so the output is a pure
   * function of the edge set and the oracle unrolls the rounds as CTEs.
   *
   * 100 TB shape: per round one join of the adjacency (cached once,
   * both directions) against the (node, label) table and one
   * (node, label)-keyed weight aggregate with a min-struct argmax —
   * only slim pairs shuffle, the same per-iteration cost envelope as
   * [[Pagerank.run]]. Rounds are localCheckpoint'ed with the previous
   * round's blocks freed, so lineage stays one round deep.
   */
  def labelPropagation(edges: DataFrame, uCol: String, vCol: String,
      wCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, "need 1 <= iters <= 50")
    // Same graph normalization as the siblings, weight-aware: canonical
    // endpoint order, self-loops out (a node must not vote for its own
    // label), non-positive weights out, duplicate/reversed rows merged
    // by SUMMING their weights.
    val und = edges.select(
        least(col(uCol), col(vCol)).cast("long").as("u"),
        greatest(col(uCol), col(vCol)).cast("long").as("v"),
        col(wCol).cast("long").as("w"))
      .where(col("u") =!= col("v") && col("w") > 0)
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    val adj = und
      .union(und.select(col("v").as("u"), col("u").as("v"), col("w")))
      .repartition(col("v")).persist()
    var labels = adj.select(col("u").as("node_id"))
      .distinct().withColumn("label", col("node_id"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        val prev = labels
        labels = adj
          .join(labels, adj("v") === labels("node_id"))
          .groupBy(adj("u"), col("label"))
          .agg(sum(col("w")).as("ws"))
          .groupBy(col("u").as("node_id"))
          .agg(min(struct((-col("ws")).as("nw"), col("label").as("l")))
            .as("best"))
          .select(col("node_id"), col("best.l").as("label"))
          .localCheckpoint()
        unpersistCheckpoint(prev)
      }
    } finally {
      adj.unpersist(false)
    }
    labels
  }
}
