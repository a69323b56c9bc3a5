package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan regression guards: the plans that make these operators
 * scale are asserted, not assumed — a refactor that reintroduces a
 * cartesian product, drops a pushed filter, or loses map-side partial
 * aggregation fails here, not in a 100 TB deployment.
 */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.benchQueries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to scan, partial aggregation before exchange") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"))
    assert(p.contains("partial_sum"))
  }

  test("q_join_broadcast: dimension side broadcast, no shuffle join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("set-similarity joins never plan a cartesian product") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_allpairs",
      "dedup_simhash", "dedup_fuzzy_key", "q_resource_alloc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("text ops are scan-projections: no shuffle in per-doc analysis") {
    for (q <- Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a per-row computation")
    }
  }

  test("text_vocab: top-k is a merged per-partition heap, not a global sort") {
    val p = plan("text_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab cut should plan as TakeOrderedAndProject (per-partition top-k)")
    assert(p.contains("partial_count"), "vocab lost map-side partial aggregation")
  }

  test("text_pmi: top-k is a per-partition heap; marginal aggs stay partial") {
    val p = plan("text_pmi")
    assert(p.contains("TakeOrderedAndProject"),
      "PMI cut should plan as TakeOrderedAndProject (per-partition top-k)")
    assert(!p.contains("CartesianProduct"), "PMI joins must stay keyed")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "bigram counting lost map-side partial aggregation")
  }

  test("q_cusum / q_gap_fill: event rows collapse map-side; windows run " +
      "over the slim bucket table under one group partitioning") {
    for (q <- Seq("q_cusum", "q_gap_fill")) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q lost the map-side bucket collapse")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("q_star_join: all three dimension sides broadcast, the date " +
      "filter reaches the orders scan, facts exchange at most twice") {
    val p = plan("q_star_join")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date range must push to the orders scan as a PushedFilter")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "region predicate must push to the region scan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, // li, orders(+cust fact side) + final agg
      s"star join shuffles too much: $exchanges hash exchanges\n$p")
  }

  test("q_session_overlap: the interval-overlap join is an EQUI-join on " +
      "the chunk id, never the cartesian the raw range predicate plans") {
    val p = plan("q_session_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "interval overlap fell back to a non-equi join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected a keyed join on the chunk")
  }

  test("q_pack_sequences: range-spread per-group cumsum, no window at all") {
    // The final plan is the attach pass over the shared shuffle — it must
    // contain NO Window (the one-task-per-group shape this op replaces).
    val p = plan("q_pack_sequences")
    assert(!p.contains("Window"), "packing reintroduced a window")
    assert(!p.contains("SinglePartition"), "packing planned a global operator")
    // The shuffle side: range partitioning on (group, id) — one giant
    // group spreads over many partitions — and the payload is the slim
    // 3-column projection (no text in the shuffle).
    val slim = graft.operators.Packing
      .slimSorted(spark.read.parquet(s"$dir/documents.parquet"),
        "text", "doc_id", "source")
    val sp = slim.queryExecution.executedPlan.toString
    assert(sp.contains("rangepartitioning(source"),
      "packing must range-partition by (group, id)")
    assert(!sp.contains("SinglePartition"), "packing sort collapsed to one task")
  }

  test("duplicate-span ops: doc-partitioned windows, no cartesian, 8-byte dup keys") {
    for (q <- Seq("dedup_spans", "dedup_strip_spans")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
      assert(!p.contains("SinglePartition"), s"$q planned a global operator")
      // island-merge windows must partition by document, never globally
      assert(p.contains("hashpartitioning(doc_id"),
        s"$q windows are not doc-partitioned")
      // duplicate detection must aggregate gram HASHES (positioned native
      // expression), not gram strings
      assert(p.contains("positioned_word_shingles"),
        s"$q lost the native positioned-shingle builder")
    }
  }

  test("q_join_skew: salted equi-join plans as a hash join on (keys, salt)") {
    val p = plan("q_join_skew")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "salting degenerated to a non-equi join")
    assert(p.contains("__salt"), "salt column missing from the join keys")
  }

  test("pipeline_host_rank: host-id assignment never plans a single-partition window") {
    // r12 verdict's one weak row: row_number().over(Window.orderBy(host))
    // funnels the full host dimension (~1e8 at Common Crawl scale) through
    // one partition. GlobalSequence replaces it; assert the window stays gone.
    val p = plan("pipeline_host_rank")
    assert(!p.contains("Window"), "host-rank reintroduced a global window")
  }

  test("pipeline_crawl_gate: the batch face never FORCES a broadcast " +
      "of the robots slice (corpus-scale hosts ≈ the full dimension)") {
    // r13's weak row broadcast the FULL per-host robots table; r14 sliced
    // it by a LEFT-SEMI on the batch's distinct hosts but force-hinted
    // BOTH sides — bounded for a micro-batch, unrefusable for a corpus
    // batch whose distinct hosts ARE the host universe. r15: the batch
    // face passes broadcastBounded=false, so the ONLY broadcast decisions
    // left are Catalyst/AQE's own size-based ones. Assert the semi-join
    // slice survives and no broadcast HINT remains in the logical plan.
    val df = SparkEntry.benchQueries("pipeline_crawl_gate")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      "robots slice lost its batch-host semi-join — full-dimension join")
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"),
      "batch face still carries a forced broadcast hint AQE cannot refuse")
  }

  test("r15 sidecar/media rows keep their 100TB shapes: WAT extraction " +
      "is a pure scan projection, the media chain never shuffles, the " +
      "accounting rows keep map-side partials, and no politeness face " +
      "carries a forced broadcast hint") {
    // io_wat_extract / pipeline_crawl_media: per-row chains — any
    // Exchange means a blob or per-row computation started shuffling
    for (q <- Seq("io_wat_extract", "pipeline_crawl_media")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a per-row chain")
    }
    // accounting flagships: slim keyed groupBys with map-side partials
    for (q <- Seq("pipeline_wet_ingest", "pipeline_wat_links")) {
      val p = plan(q)
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q lost map-side partial aggregation")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    // politeness batch faces: AQE must stay free to refuse a broadcast
    for (q <- Seq("pipeline_frontier_admit", "pipeline_crawl_loop")) {
      val lp = SparkEntry.benchQueries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!lp.contains("strategy=broadcast"),
        s"$q carries a forced broadcast hint")
    }
  }

  test("r16 crawl-consumer rows keep their 100TB shapes: revisit " +
      "accounting joins by GROUPING (no Join node, two exchanges), " +
      "zipnum random access never shuffles, and redirect resolution " +
      "carries no forced broadcast") {
    // pipeline_crawl_revisit: the digest grouping IS the dedup join
    val rev = plan("pipeline_crawl_revisit")
    assert(!rev.contains("Join"),
      "revisit accounting must not plan a join — the (host, digest) " +
        "grouping carries the dedup relation")
    assert(rev.contains("partial_sum") || rev.contains("partial_count"),
      "revisit accounting lost map-side partials")
    // io_cdx_zipnum / pipeline_zipnum_fetch: partition-local group walks
    // + the final slice — nothing blob-shaped may shuffle twice; no
    // cartesian anywhere
    for (q <- Seq("io_cdx_zipnum", "pipeline_zipnum_fetch")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    // pipeline_redirect_resolve: the per-round localCheckpoint is the
    // iteration discipline — the final plan must read the materialized
    // last round (an RDD scan), not re-derive the whole doubling chain
    val red = plan("pipeline_redirect_resolve")
    assert(red.contains("ExistingRDD"),
      "redirect resolution lost its per-round checkpoint materialization")
    assert(!red.contains("Join"),
      "the final redirect projection must sit on the checkpoint, not " +
        "re-plan the doubling joins")
  }

  test("pipeline_crawl_loop: the caller-materializes contract — the " +
      "localCheckpoint'ed production variant produces IDENTICAL rows " +
      "to the registered re-scanning face") {
    val reg = SparkEntry.benchQueries("pipeline_crawl_loop")(spark, dir)
      .collect().map(_.toSeq).toSet
    val mat = graft.queries.WebQueries.crawlLoopMaterialized(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(mat == reg,
      "materializing the decided wave changed the crawl-loop output")
  }

  test("crawlDecide gate face: a bounded micro-batch still broadcasts " +
      "the batch-host probe and the sliced robots build side") {
    // The streaming gate passes broadcastBounded=true (micro-batches are
    // bounded by construction): the URL side must never shuffle, so the
    // admit join must be a BroadcastHashJoin whose build side passes
    // through the host semi-join.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val urls = Seq(1, 2, 3).map(i => s"https://h$i.test/p$i").toDF("url")
    val robots = Seq(("h1.test", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "robots")
    val p = graft.streaming.StreamingLens
      .crawlDecide(urls, "url", "bot/1.0", robots)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "gate face shuffled the micro-batch URL side")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, "gate-face admit join must stay a broadcast hash join")
    assert(p.indexOf("LeftSemi", joinIdx) >= 0,
      "admit join's build side no longer passes through the host semi-join")
  }

  test("similarity searches cut top-k map-side: no WindowExec in any search plan") {
    // WindowExec has no map-side partial — a rank()-window top-k ships the
    // FULL scored candidate set to |queries| reduce tasks. Every search must
    // plan the TopKByValue partial aggregate (partial_topk_by_value before
    // the exchange) instead.
    for (q <- Seq("sim_topk_brute", "sim_ivf_topk", "sim_ann_srp",
      "sim_pq_topk", "sim_rpq_topk", "sim_ivfpq_topk", "sim_binary_topk")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q funnels candidates through a window")
      assert(p.contains("partial_topk_by_value"),
        s"$q lost the map-side partial top-k aggregate")
    }
  }

  test("probed searches broadcast the query probe list: the corpus index never shuffles") {
    // Two legitimate shapes exist: slim-query search (probe list is
    // |queries|·nprobe rows — broadcast it, the corpus-side index is
    // scanned in place) and corpus-scale self-search (sim_ivf_kmeans —
    // a shuffle join is required and cell count must scale with the
    // corpus). These three are the slim-query shape; losing the
    // broadcast would re-shuffle the WHOLE index by a low-cardinality
    // cell key at 100 TB.
    for (q <- Seq("sim_ivfpq_topk", "sim_rpq_topk", "sim_ann_srp")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q stopped broadcasting the probe list (corpus now shuffles)")
      assert(!p.contains("SortMergeJoin"),
        s"$q plans a sort-merge join — the index is being shuffled")
    }
  }

  test("sim_ivfpq_topk: equi-join on the cell id, native PQ expressions in-plan") {
    val p = plan("sim_ivfpq_topk")
    assert(!p.contains("CartesianProduct"),
      "IVF cell pruning degenerated to a cartesian scan")
    // the index is built by the codegen'd expressions, not HOFs
    assert(p.contains("pq_encode"), "corpus side lost the native PQ encoder")
    assert(p.contains("pq_adc_cosine"), "scoring lost the native ADC kernel")
    assert(p.contains("nearest_centroids"), "query side lost the probe list")
  }

  test("sessionization partitions by key, never a global window") {
    val p = plan("q_sessionize")
    // a global (empty-partition) window would show 'Window [..] ORDER BY' with
    // SinglePartition distribution; key-partitioned windows hash-partition
    assert(p.contains("hashpartitioning(user_id"))
    assert(!p.contains("SinglePartition"))
  }

  test("q_scd2: one key exchange feeds both windows and the version group-by") {
    val p = plan("q_scd2")
    // HashPartitioning(user_id) satisfies the (user_id, __ver) group-by
    // and the lead() window, so the whole interval build is ONE shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"scd2 planned $exchanges exchanges:\n$p")
  }

  test("q_temperature_mix: rates broadcast back — corpus side never shuffle-joins") {
    val p = plan("q_temperature_mix")
    // the corpus joins its per-group rate via broadcast (rates = #groups
    // rows); a SortMergeJoin here would shuffle the full corpus on the
    // group key for a handful of build rows
    assert(p.contains("BroadcastHashJoin"), "rate join lost its broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus shuffled to meet its rates")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"), "copy fan-out lost the map-side explode")
  }

  test("text_bigram_lm: model joins keyed on the bigram, scalar vocab broadcast") {
    val p = plan("text_bigram_lm")
    assert(!p.contains("CartesianProduct"),
      "bigram scoring degenerated to a cartesian")
    // the V scalar rides a 1-row broadcast (nested-loop with a single
    // build row is the intended shape, not a data-sized cartesian)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_count"), "bigram model lost map-side partial aggregation")
  }

  test("dedup_lines_intra: within-page line dedup never leaves the scan stage") {
    val p = plan("dedup_lines_intra")
    assert(!p.contains("Exchange"),
      "line dedup is a narrow map — an exchange means it regressed to a shuffle")
  }

  test("text_search_topk: retrieval cut is a per-partition heap; stats broadcast") {
    val p = plan("text_search_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrderedAndProject, not a global sort+limit")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "df/corpus stats should ride broadcasts, not shuffle joins")
  }

  test("sim_cluster_balance: cell sizes broadcast back — corpus never shuffle-joins") {
    val p = plan("sim_cluster_balance")
    assert(p.contains("BroadcastHashJoin"),
      "the k-row cell-size table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "corpus side shuffle-joined against a k-row aggregate")
  }

  test("q_zorder_layout: no global operator, and the rank join stays slim") {
    // The final position pass is GlobalSequence's zipWithIndex RDD (range
    // exchange inside the lineage), so the outer plan is its scan; what
    // must never appear is a window rank or a single-partition stage.
    val p = plan("q_zorder_layout")
    assert(!p.contains("SinglePartition"), "layout planned a global operator")
    assert(!p.contains("Window"), "layout fell back to a window rank")
    // and the zval computation joins only (id, rank) pairs — inspect the
    // pre-position plan where the join is visible
    val orders = graft.queries.T(spark, dir, "orders")
    val ra = graft.operators.GlobalSequence.withSequentialId(
      orders.select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_custkey")),
      org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_orderkey")), "ra")
    val joined = ra.join(ra.withColumnRenamed("ra", "rb"), Seq("o_orderkey"))
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        graft.operators.Layout.morton(
          org.apache.spark.sql.functions.col("ra"),
          org.apache.spark.sql.functions.col("rb")).as("zval"))
    val jp = joined.queryExecution.executedPlan.toString
    assert(!jp.contains("CartesianProduct") && !jp.contains("BroadcastNestedLoop"),
      "rank join must be an equi-join on the id")
    assert(!jp.contains("Window") && !jp.contains("SinglePartition"))
  }

  test("text_tfidf_pairs: pair join is salted on (token, sa, sb); dfc broadcast") {
    val p = plan("text_tfidf_pairs")
    // the quadratic self-join must key on the salted triangle, not the
    // bare token (term skew would serialize the pair space otherwise)
    assert(p.contains("sa") && p.contains("sb"),
      "pair join lost its salt columns")
    assert(!p.contains("CartesianProduct"), "pair join planned a cartesian")
    // the df-cap side is a vocab-sized build — must broadcast
    assert(p.contains("BroadcastHashJoin"), "dfc join lost its broadcast")
  }

  test("text_nb_classify: model joins broadcast; no corpus-side shuffle join") {
    val p = plan("text_nb_classify")
    // both the class table and the (vocab × classes) model ride to the
    // scored side as broadcasts — the scored text must never shuffle-join
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "model join must be broadcast")
    assert(!p.contains("SortMergeJoin"),
      "scoring side shuffle-joined the model — corpus-shaped exchange")
  }

  test("text_collocations: top-k is a heap cut; totals are broadcast") {
    val p = plan("text_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      "PMI k-cut should be a per-partition heap, not a global sort")
    assert(p.contains("partial_count"), "bigram counts lost map-side combine")
  }

  test("sim_label_confusion: centroids broadcast; argmin window is per-vector") {
    val p = plan("sim_label_confusion")
    assert(p.contains("BroadcastHashJoin"),
      "centroid grid join must broadcast the (labels × dims) side")
    assert(!p.contains("SinglePartition"),
      "confusion planned a global operator")
  }

  test("graph outputs are slim: iterations ran eagerly, lineage truncated") {
    // ppr/hits iterate with per-round localCheckpoint, so the FINAL plan
    // must be (at most joins over) checkpointed 8-byte-pair scans — a
    // deep plan here would mean lineage grew O(iters) and every action
    // re-executes the whole power iteration.
    val ppr = plan("q_ppr")
    assert(ppr.contains("ExistingRDD"), "ppr output lost its checkpoint")
    assert(!ppr.contains("Generate") && !ppr.contains("FileScan"),
      "ppr output re-derives the graph instead of reading the checkpoint")
    val hits = plan("q_hits")
    assert(hits.contains("ExistingRDD"), "hits output lost its checkpoint")
    assert(!hits.contains("CartesianProduct") &&
      !hits.contains("BroadcastNestedLoopJoin"),
      "hits output densify must be an equi-join")
  }

  test("text_blocklist + sim_random_proj are pure scan projections") {
    for (q <- Seq("text_blocklist", "sim_random_proj")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a per-row computation")
    }
    // the projection is the native expression, not an interpreted HOF
    assert(plan("sim_random_proj").contains("random_project_signs"))
  }

  test("q_winsorize + q_pad_batches: bounds/offsets broadcast back — " +
      "rows join them without a second full shuffle") {
    for (q <- Seq("q_winsorize", "q_pad_batches")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q must broadcast its per-group bound/offset table")
      assert(!p.contains("Window"), s"$q reintroduced a window operator")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q_triangles: wedge and closure are equi-joins on slim id tuples") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "triangle closure must be an equi-join, never all-pairs")
    assert(p.contains("partial_count"),
      "per-node triangle count lost map-side partial aggregation")
  }

  test("q_label_prop: rounds ran eagerly — final plan reads the checkpoint") {
    val p = plan("q_label_prop")
    assert(p.contains("ExistingRDD"), "label_prop output lost its checkpoint")
    assert(!p.contains("FileScan"),
      "label_prop output re-derives the graph instead of reading the checkpoint")
  }
}
