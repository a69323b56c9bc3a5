package graft.streaming

import graft.engine.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Structured-Streaming support for lens pipelines.
 *
 * The reference's Socket (late-bound source, reference:
 * host-go/repository/repository.go:369-387) maps directly onto a
 * streaming DataFrame: a lens pipeline is plan-to-plan
 * (`DataFrame => DataFrame`), so the SAME pipeline object runs unchanged
 * over `spark.readStream` input for every stateless op — filters,
 * projections, renames, explodes, computed columns. Its pull model
 * (one item in flight, reference: host-go/engine/pipes/fromSource.go:37-56)
 * becomes micro-batch incremental execution; EOS (type id 127) becomes
 * query termination.
 *
 * What the reference cannot express — event-time semantics (watermarks,
 * windowed aggregation, late-data policy) and fault-tolerant keyed state —
 * is added here as first-class operators, because a 100 TB training-data
 * pipeline ingests continuously: dedup and windowed profiling must run on
 * the stream, not on nightly batch reruns.
 */
object StreamingLens {

  /** Ops whose semantics require a finite input; applying them to a
   *  streaming DataFrame either throws in Spark's analyzer or silently
   *  changes meaning — fail fast at pipeline-bind time instead. */
  private val BatchOnlyOps = Set("sort", "limit", "counter", "collect_group",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "similar_pairs",
    "sessionize", "sample_group",
    // iterative (localCheckpoint) graph ops and whole-corpus aggregates
    "pagerank", "ppr", "hits", "collocations", "tfidf_pairs", "nb_classify",
    "label_confusion", "ewma", "cluster_update", "search_and", "vocab_growth")

  /**
   * Bind a lens pipeline to a streaming DataFrame (the Socket →
   * Structured Streaming mapping). Stateless pipelines apply unchanged;
   * batch-only stages are rejected eagerly with the op name (the analogue
   * of the reference erroring on a missing module export).
   */
  def forward(pipeline: Pipeline, stream: DataFrame): DataFrame = {
    require(stream.isStreaming, "forward(stream) expects a streaming DataFrame")
    val bad = pipeline.stages.map(_.name).filter(n => BatchOnlyOps.exists(n.startsWith))
    require(bad.isEmpty,
      s"lens op(s) ${bad.mkString(", ")} are batch-only; " +
        "use windowed/stateful streaming variants instead")
    pipeline.forward(stream)
  }

  /**
   * Event-time windowed aggregation with a watermark: the streaming
   * analogue of `groupBy(...).agg(...)`. `aggExprs` are SQL aggregate
   * expressions ("count(1) as n", "sum(x) as total"). State is bounded by
   * the watermark: windows older than `delay` are finalized and dropped —
   * the property that makes a continuous 100 TB ingest aggregation
   * feasible at all.
   */
  def eventWindowAgg(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      window: String,
      keyCols: Seq[String],
      aggExprs: Seq[String]): DataFrame = {
    require(aggExprs.nonEmpty, "eventWindowAgg requires at least one aggregate expression")
    val withWm = stream.withWatermark(tsCol, delay)
    val groupCols = org.apache.spark.sql.functions.window(col(tsCol), window) +:
      keyCols.map(col)
    val aggs = aggExprs.map(expr)
    withWm.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Gap-based session windows — the streaming face of the batch
   * `Sessionize.assign`/`stats` pair: each key's events merge into a
   * session while consecutive events are less than `gap` apart; a session
   * closes (and its aggregate row finalizes) once the watermark passes its
   * end. State per key = the open session only — bounded, the property
   * that lets sessionization run on a continuous ingest instead of
   * nightly batch replays.
   *
   * Output: session_window (start, end) + keyCols + the aggregates; the
   * session index of the batch op corresponds to the rank of
   * `session_window.start` within the key.
   *
   * Boundary semantics: `session_window` starts a NEW session when the
   * inter-event gap is ≥ `gap` (window extent is [ts, ts+gap)); the batch
   * op keeps the session on an exactly-`gap` difference (`> gap` starts
   * new). Events exactly at the gap boundary differ — Spark's windowing
   * contract, documented rather than papered over.
   */
  def sessionWindowAgg(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      gap: String,
      keyCols: Seq[String],
      aggExprs: Seq[String]): DataFrame = {
    require(aggExprs.nonEmpty, "sessionWindowAgg requires at least one aggregate expression")
    val withWm = stream.withWatermark(tsCol, delay)
    val groupCols = session_window(col(tsCol), gap) +: keyCols.map(col)
    val aggs = aggExprs.map(expr)
    withWm.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Streaming exact dedup: first occurrence of each `idCols` tuple wins;
   * duplicates arriving within the watermark horizon are dropped. State =
   * one entry per distinct key inside the horizon (bounded), exactly the
   * streaming face of `Dedup.exact`.
   */
  def streamingDedup(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      idCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      // Keyed on idCols ALONE: a duplicate id at a different event time is
      // still a duplicate (dropDuplicates(id :+ ts) would let it through).
      // WithinWatermark bounds the state exactly like the docstring says.
      .dropDuplicatesWithinWatermark(idCols)

  /**
   * Streaming signature-level near-dedup: first occurrence of each 64-bit
   * SimHash signature wins; later arrivals with the SAME signature inside
   * the watermark horizon are dropped. The signature is the native
   * codegen `SimHash64` over whitespace tokens — identical to the batch
   * [[graft.operators.Dedup.simHashSignatures]] — so this catches the
   * whitespace/token-profile clones exact content-hash dedup misses
   * (boilerplate re-crawls, trailing-space variants) while staying a pure
   * keyed-state op: one 8-byte key per distinct signature in the horizon.
   *
   * Contract: signature-EXACT (hamming 0) — the hamming≤3 banded search
   * with its candidate-verify join is a batch shape (`Dedup.simHash`);
   * running it on a stream would need cross-band stateful aggregation
   * with retraction, which Append-mode streaming cannot express. At
   * ingest, this op is the cheap first gate; the banded near-dup pass
   * runs on the accumulated corpus behind it.
   */
  def streamingSimhashDedup(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      textCol: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .withColumn("__sig", org.apache.spark.sql.graft.GraftHashExpressions
        .simhash64(split(col(textCol), " ")))
      .dropDuplicatesWithinWatermark(Seq("__sig"))
      .drop("__sig")

  /**
   * Streaming BANDED near-dedup gate (hamming ≤ `maxHamming`, not just
   * signature-exact): the full chunk-pigeonhole search of
   * [[graft.operators.Dedup.simHashAgainst]] run per micro-batch against
   * a persistent signature index — the production shape for "drop
   * near-duplicates of anything already ingested" at 100 TB, where the
   * index is the corpus itself and therefore deliberately NOT
   * watermark-bounded keyed state but an external table (here a parquet
   * directory; on a cluster, a bucketed table location).
   *
   * Per batch: (1) sign the batch (native `SimHash64`); (2) in-batch
   * pass — drop every doc within `maxHamming` of ANY smaller-id doc in
   * the same batch (whether or not that doc itself survives — the
   * deterministic, conservative cut; batch CC keep-min and this agree on
   * id-ordered chains and differ only on multi-hop shapes a micro-batch
   * rarely holds); (3) drop survivors within `maxHamming` of any
   * indexed signature;
   * (4) append the remaining rows to `outDir` and their signatures to
   * `indexDir`. Across batches the gate is arrival-order greedy — a doc
   * is probed against kept-and-indexed signatures only — and every drop
   * is exact: it carries a verified hamming witness, never just a bucket
   * collision.
   *
   * Use with `stream.writeStream.foreachBatch(nearDedupGate(...)).start()`.
   * Exactly-once caveat: a replayed micro-batch re-probes the index it
   * already updated, so its survivors dedup against themselves — replays
   * must key `outDir` appends by batchId (Spark's foreachBatch contract)
   * if the sink must be idempotent; signatures re-appended by a replay
   * are harmless (the gate's drop decisions are unchanged by duplicate
   * index rows).
   */
  def nearDedupGate(
      textCol: String,
      idCol: String,
      indexDir: String,
      outDir: String,
      maxHamming: Int = 3): (DataFrame, Long) => Unit = (batch, _) =>
    signatureGateBody(batch,
      graft.operators.Dedup.simHashSignatures(batch, textCol, idCol),
      idCol, indexDir, outDir, maxHamming)

  /**
   * Streaming MEDIA near-dedup gate — the continuous face of the
   * `pipeline_media_dedup` batch flagship: per micro-batch, every real
   * media payload (BMP/PNG/JPEG/GIF, [[graft.operators.Multimodal.SniffCodec]]
   * magic dispatch per row) collapses to an aHash signature INSIDE the
   * batch — blobs never enter keyed state or the persistent index —
   * and the signature then rides the text gate's machinery verbatim:
   * in-batch pigeonhole near-dups drop, survivors probe the persistent
   * signature index, kept rows append to `outDir` and their signatures
   * to `indexDir`. Same arrival-order-greedy semantics and replay
   * caveat as [[nearDedupGate]].
   *
   * 100 TB shape: per-batch cost is one batched mapPartitions decode
   * (payload → 8 bytes) plus slim 16-bit-band joins; the index holds
   * 16 B/row regardless of media size.
   */
  def mediaDedupGate(
      payloadCol: String,
      idCol: String,
      indexDir: String,
      outDir: String,
      maxHamming: Int = 3): (DataFrame, Long) => Unit = (batch, _) =>
    signatureGateBody(batch,
      graft.operators.Multimodal.imagePhash(
        batch.select(col(idCol), col(payloadCol)), payloadCol, idCol,
        codec = graft.operators.Multimodal.SniffCodec),
      idCol, indexDir, outDir, maxHamming)

  /** Shared body of the signature-keyed dedup gates: in-batch pigeonhole
   *  drop, probe against the persistent (doc, simhash) index, append
   *  kept rows + signatures. */
  private def signatureGateBody(batch: DataFrame, sigs0: DataFrame,
      idCol: String, indexDir: String, outDir: String,
      maxHamming: Int): Unit = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val sigs = sigs0
      .localCheckpoint() // probe + two appends reuse it; cut the lineage
    val inBatchDropped = Dedup.simHashFromSignatures(sigs, maxHamming)
      .select(col("doc_b").as("doc"))
    val afterBatch = sigs.join(inBatchDropped, Seq("doc"), "left_anti")
    val indexed =
      if (new java.io.File(indexDir).exists)
        spark.read.parquet(indexDir)
      else spark.emptyDataFrame.select(lit(0L).as("doc"), lit(0L).as("simhash"))
        .limit(0)
    val kept = afterBatch.join(
      Dedup.simHashAgainst(afterBatch, indexed, maxHamming).select("doc").distinct(),
      Seq("doc"), "left_anti")
      .localCheckpoint()
    batch.join(kept.select(col("doc").as(idCol)), Seq(idCol), "left_semi")
      .write.mode("append").parquet(outDir)
    kept.write.mode("append").parquet(indexDir)
  }

  /**
   * Streaming EMBEDDING near-dedup gate — the continuous face of the
   * `pipeline_ann_dedup` batch funnel: per micro-batch, drop every row
   * semantically near (residual-ADC prefilter at `adcTau`, exact-cosine
   * verify at `exactTau`) anything already kept, using the same
   * residual-PQ machinery ([[graft.operators.Pq.encodeResidual]] /
   * [[graft.operators.Pq.residualNearDupPairs]]) the batch pipeline runs.
   *
   * Persistent state is the production index layout, deliberately NOT
   * watermarked keyed state: `indexDir` holds the kept corpus's
   * (doc, cell, codes) — m small ints + a cell id per row, the bytes a
   * 100 TB corpus actually affords to keep hot — and `outDir` holds the
   * kept rows themselves. Per batch: (1) encode the batch (corrupt rows
   * drop — a vector that cannot be encoded cannot be probed, and the
   * gate never admits unverified rows); (2) in-batch conservative cut —
   * drop every row whose verified pair has a smaller id, same greedy
   * discipline as [[nearDedupGate]] step 2; (3) probe survivors against
   * the index: same-cell candidates ADC-prefilter against the COMPRESSED
   * codes, and only the surviving sliver re-reads full vectors (joined
   * back from `outDir` by id) for the exact verify; (4) append kept rows
   * to `outDir` and their codes to `indexDir`.
   *
   * Arrival-order greedy vs the batch funnel's CC keep-min: identical on
   * id-ordered chains (spec-pinned on a split log); they differ only on
   * multi-hop duplicate shapes crossing micro-batches in non-id order —
   * the same documented gap as the SimHash gate. Replay caveat as
   * [[nearDedupGate]]: survivors of a replayed batch dedup against their
   * own indexed signatures, so idempotent sinks key appends by batchId.
   *
   * Use with `stream.writeStream.foreachBatch(embeddingDedupGate(...))
   * .start()`.
   */
  def embeddingDedupGate(
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      indexDir: String,
      outDir: String,
      adcTau: Double,
      exactTau: Double,
      saltBuckets: Int = 4): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.Pq
    import org.apache.spark.sql.graft.GraftPq
    val spark = batch.sparkSession
    val enc = Pq.encodeResidual(batch, vecCol, idCol, centroids, codebooks)
      .localCheckpoint() // in-batch pairs, probe, and index append reuse it
    // (2) in-batch pass: the batch funnel's own pair miner; drop the
    // larger id of every verified pair (conservative greedy cut).
    val inBatchDropped = Pq.residualNearDupPairs(enc, batch, vecCol, idCol,
        centroids, codebooks, adcTau, exactTau, saltBuckets)
      .select(col("b").as(idCol)).distinct()
    val afterBatch = enc.join(inBatchDropped, Seq(idCol), "left_anti")
    // (3) probe the persistent compressed index; exact-verify the sliver
    // against vectors re-read from the kept corpus.
    val kept =
      if (new java.io.File(indexDir).exists) {
        val indexed = spark.read.parquet(indexDir)
        val probes = afterBatch
          .join(batch.select(col(idCol), col(vecCol).as("__v")), Seq(idCol))
          .select(col(idCol), col("cell"), col("__v"))
        val sliver = probes.join(indexed.withColumnRenamed("doc", "__kept"),
            Seq("cell"))
          .where(GraftPq.pqResidualAdcCosine(col("__v"), col("cell"),
            col("codes"), centroids, codebooks) >= adcTau)
          .select(col(idCol), col("__kept"), col("__v"))
        val keptVecs = spark.read.parquet(outDir)
          .select(col(idCol).as("__kept"), col(vecCol).as("__kv"))
        val dropped = sliver.join(keptVecs, Seq("__kept"))
          .where(graft.functions.TextHash.cosine("__v", "__kv") >= exactTau)
          .select(col(idCol)).distinct()
        afterBatch.join(dropped, Seq(idCol), "left_anti").localCheckpoint()
      } else afterBatch.localCheckpoint()
    // (4) admit: rows to the corpus, codes to the index
    batch.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
      .write.mode("append").parquet(outDir)
    kept.select(col(idCol).as("doc"), col("cell"), col("codes"))
      .write.mode("append").parquet(indexDir)
  }

  /**
   * Streaming INGEST gate — the continuous face of the
   * `pipeline_ingest_gate` batch flagship: per micro-batch a row is
   * ADMITTED iff it is (1) content-new against the persistent corpus
   * hash index and first-id-unique within its own batch, (2) clean under
   * the substring blocklist
   * ([[org.apache.spark.sql.graft.GraftScreen.containsAnyPattern]] —
   * one Aho–Corasick pass), and (3) passes the Gopher heuristics
   * ([[graft.operators.TextAnalysis.gopherRules]]). Admitted rows append
   * to `outDir`; their 8-byte content hashes append to `indexDir`.
   *
   * Persistent state is the production index layout, deliberately NOT
   * watermarked keyed state: `indexDir` holds ONE xxhash64 per admitted
   * document (`__h` LongType) — the only state a 100 TB corpus affords
   * to keep hot, 8 B/doc regardless of document size. Seed it from an
   * existing corpus with [[ingestIndexOf]]. Per batch: one left-anti
   * probe of the index on the hash, one slim (hash, min id) in-batch
   * aggregate, then the screen + Gopher stages run as narrow scan
   * projections over the surviving sliver — no further exchange.
   *
   * Indexing only ADMITTED hashes preserves batch parity: a row whose
   * earlier twin was rejected is rejected again by the SAME
   * deterministic-on-text stage (screen/Gopher verdicts replay; a
   * corpus-dup twin is still a corpus dup), so no admitted-vs-dropped
   * state beyond the admitted set is needed. Arrival-order min-id vs
   * the batch flagship's global min-id: identical on id-ordered split
   * logs (spec-pinned); the same documented gap as [[nearDedupGate]].
   * Replay caveat likewise: survivors of a replayed batch dedup against
   * their own indexed hashes — idempotent sinks key appends by batchId.
   *
   * Use with `stream.writeStream.foreachBatch(ingestGate(...)).start()`.
   */
  def ingestGate(
      textCol: String,
      idCol: String,
      patterns: Seq[String],
      indexDir: String,
      outDir: String): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.graft.GraftScreen
    val spark = batch.sparkSession
    val hashed = batch.withColumn("__h", xxhash64(col(textCol)))
    val indexed =
      if (new java.io.File(indexDir).exists) spark.read.parquet(indexDir)
      else spark.emptyDataFrame.select(lit(0L).as("__h")).limit(0)
    val fresh = hashed.join(indexed, Seq("__h"), "left_anti")
    // within-batch keep-min: slim (hash, min id) aggregate; the payload
    // rides a left-semi re-attach, never the aggregate itself
    val keepers = fresh.groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    val unique = fresh.join(keepers, Seq("__h", idCol), "left_semi")
    val screened = unique.where(
      !GraftScreen.containsAnyPattern(col(textCol), patterns))
    val metricCols = Seq("n_words", "mean_word_len", "symbol_ratio",
      "alpha_ratio", "n_stop", "gopher_pass")
    val admitted = TextAnalysis.gopherRules(screened, textCol, idCol,
        keep = screened.columns.filterNot(_ == idCol).toSeq)
      .where(col("gopher_pass"))
      .drop(metricCols: _*)
      .localCheckpoint() // corpus + index appends reuse it; cut the lineage
    admitted.drop("__h").write.mode("append").parquet(outDir)
    admitted.select(col("__h")).write.mode("append").parquet(indexDir)
  }

  /** Hash-index seed for [[ingestGate]]: the `indexDir` layout (`__h`
   *  LongType, one xxhash64 per distinct document) for an existing
   *  corpus. Write it once before starting the gate. */
  def ingestIndexOf(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(xxhash64(col(textCol)).as("__h")).distinct()

  private val CrawlHostRe = "^[a-z0-9+.-]+://([^/?#]+)"
  private val CrawlPathRe = "^[a-z0-9+.-]+://[^/?#]+([^#]*)"

  /** The per-batch decision body of [[crawlGate]], usable directly in
   *  batch (gate ≡ batch parity is spec-pinned on this function):
   *  canonicalize `urlCol`, extract host + path(+query), left-join the
   *  (host, robots) table, and append [[graft.operators.Robots]]'
   *  RFC 9309 verdict columns (allowed, matched_rule, crawl_delay_ms,
   *  n_sitemaps) plus `canon_url`/`host`. A host absent from the robots
   *  table is fully allowed with delay -1 (the RFC's no-robots default).
   *
   *  100 TB shape: canonicalization + path split fuse into the scan.
   *  The robots table is per-HOST but NOT broadcastable in absolute
   *  terms (~10⁷–10⁸ hosts × ~1 KB robots text at Common Crawl scale ≈
   *  tens of GB), so the full dimension is never hinted: the batch's
   *  distinct hosts (slim single column) feed a LEFT-SEMI that slices
   *  the robots table down to the hosts this batch actually touches,
   *  and only that batch-bounded slice joins into the admit join. The
   *  canonicalized input feeds both the host probe and the admit join;
   *  `checkpointCanon = true` (what [[crawlGate]] passes — its input
   *  is one micro-batch, bounded by construction) localCheckpoints it
   *  once instead of re-running the canonicalize lineage twice.
   *  CORPUS-scale batch callers must pass `false`: materializing a
   *  100 TB URL table into executor block storage to save one extra
   *  scan is the wrong trade, and per CLAUDE.md's rule corpus-scale
   *  inputs are the CALLER's to materialize.
   *
   *  `broadcastBounded` gates the two explicit `broadcast()` hints on
   *  the host probe and the robots slice. `true` (what [[crawlGate]]
   *  passes) is honest ONLY when the input is bounded by construction —
   *  a micro-batch's distinct hosts are a few thousand rows, so forcing
   *  the broadcast skips a shuffle of the slice AND keeps the URL side
   *  un-shuffled regardless of what the stats estimator guesses about a
   *  just-checkpointed frame. A corpus-scale batch caller must pass
   *  `false`: its distinct hosts ARE the host universe, the slice ≈ the
   *  full robots table, and an explicit hint would force a broadcast
   *  AQE could no longer refuse — unhinted, Catalyst/AQE broadcast the
   *  slice only when its measured size is genuinely under threshold and
   *  otherwise fall back to a shuffle join on `host`. */
  def crawlDecide(batch: DataFrame, urlCol: String, agent: String,
      robots: DataFrame, checkpointCanon: Boolean = true,
      broadcastBounded: Boolean = true): DataFrame = {
    val canon0 = batch
      .withColumn("canon_url",
        org.apache.spark.sql.graft.Url.canonicalize(col(urlCol)))
      .withColumn("host", regexp_extract(col("canon_url"), CrawlHostRe, 1))
      .withColumn("__path", {
        val p = regexp_extract(col("canon_url"), CrawlPathRe, 1)
        when(p === "", "/").otherwise(p)
      })
    val canon = if (checkpointCanon) canon0.localCheckpoint() else canon0
    def bounded(df: DataFrame) = if (broadcastBounded) broadcast(df) else df
    val batchHosts = canon.select(col("host")).distinct()
    val slice = robots.select(col("host"), col("robots").as("__robots"))
      .join(bounded(batchHosts), Seq("host"), "left_semi")
    val joined = canon
      .join(bounded(slice), Seq("host"), "left")
      .withColumn("__robots", coalesce(col("__robots"), lit("")))
      .withColumn("__agent", lit(agent))
    graft.operators.Robots
      .decisions(joined, "__robots", "__agent", "__path")
      .drop("__robots", "__agent", "__path")
  }

  /**
   * Streaming crawl-politeness gate — the continuous face of the
   * web-ingest batch operators ([[graft.operators.Robots]] +
   * [[org.apache.spark.sql.graft.Url]] canonicalization): per
   * micro-batch of fetch-candidate URLs, [[crawlDecide]] probes the
   * persistent per-host robots table at `robotsDir` and only URLs the
   * host's robots file allows for `agent` append to `outDir`; every
   * batch also appends a per-host politeness audit row to `auditDir`
   * (`host, n_candidates, n_admitted, crawl_delay_ms, batch_id`) so a
   * fetch scheduler can budget against Crawl-delay without rescanning
   * the stream. Sitemap discovery rides along: `n_sitemaps` counts the
   * robots file's Sitemap lines (explode them with
   * [[graft.operators.Sitemap.entries]] downstream).
   *
   * State is the robots TABLE, not keyed stream state: robots files
   * change out-of-band (a refresh job overwrites `robotsDir`), and the
   * table is per-host — broadcast-sized next to any URL stream. Replay
   * caveat as every foreachBatch sink here: appends are re-run on
   * recovery, so idempotent deployments key writes by `batch_id`.
   *
   * Use with `stream.writeStream.foreachBatch(crawlGate(...)).start()`.
   */
  def crawlGate(urlCol: String, agent: String, robotsDir: String,
      outDir: String, auditDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      // Resolve existence through the Hadoop FileSystem API: a bare
      // java.io.File probe is local-FS-only and would silently disable
      // the politeness gate (every URL admitted, delay -1) when
      // robotsDir lives on HDFS/S3 — the actual 100 TB deployment.
      val robotsPath = new org.apache.hadoop.fs.Path(robotsDir)
      val robotsFs = robotsPath
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val robots =
        if (robotsFs.exists(robotsPath)) spark.read.parquet(robotsDir)
        else {
          import spark.implicits._
          Seq.empty[(String, String)].toDF("host", "robots")
        }
      // two consumers (admit + audit): cut the batch-bounded lineage once
      val decided = crawlDecide(batch, urlCol, agent, robots).localCheckpoint()
      decided.where(col("allowed"))
        .write.mode("append").parquet(outDir)
      decided.groupBy(col("host")).agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_admitted"),
          max(col("crawl_delay_ms")).as("crawl_delay_ms"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(auditDir)
    }

  /** Per-host frontier schedule — closes the politeness loop over
   *  [[crawlGate]]'s audit output. Inputs: the cumulative audit table
   *  (`host, n_admitted, crawl_delay_ms, batch_id`, one row per host
   *  per batch) and the fetcher's completion log
   *  (`host, fetch_ts_ms`). Output, one row per audited host:
   *    - `crawl_delay_ms` — the LATEST batch's verdict for the host
   *      (robots files change out-of-band; `max_by(_, batch_id)` tracks
   *      the refresh), RFC no-robots default -1 preserved;
   *    - `n_admitted_total`, `n_batches` — budget accounting;
   *    - `last_fetch_ms` — most recent completed fetch, -1 if never
   *      fetched;
   *    - `next_eligible_ms` — `last_fetch + max(crawl_delay, 0)`; a
   *      never-fetched host is eligible immediately (0).
   *  A scheduler polls this table and releases a host's queue only at
   *  `next_eligible_ms` — the politeness loop the audit rows exist for.
   *
   *  100 TB shape: two keyed aggregates on `host` plus one host-keyed
   *  join, all over per-host/per-batch logs that are orders of
   *  magnitude smaller than the URL stream; every shuffled row is slim
   *  (host + three longs). No broadcast hint — the two sides are both
   *  host-dimension-sized, and AQE may still pick one at runtime. */
  def frontierSchedule(audit: DataFrame, fetches: DataFrame): DataFrame = {
    val latest = audit.groupBy(col("host")).agg(
      expr("max_by(crawl_delay_ms, batch_id)").as("crawl_delay_ms"),
      sum(col("n_admitted")).as("n_admitted_total"),
      count(lit(1)).as("n_batches"))
    val last = fetches.groupBy(col("host"))
      .agg(max(col("fetch_ts_ms")).as("last_fetch_ms"))
    latest.join(last, Seq("host"), "left")
      .withColumn("last_fetch_ms", coalesce(col("last_fetch_ms"), lit(-1L)))
      .withColumn("next_eligible_ms",
        when(col("last_fetch_ms") < 0L, lit(0L))
          .otherwise(col("last_fetch_ms") +
            greatest(col("crawl_delay_ms"), lit(0L))))
  }

  /** Frontier ENFORCEMENT — the consumer of [[frontierSchedule]]'s
   *  ledger, closing the politeness loop operationally: candidate URLs
   *  (already robots-admitted by [[crawlGate]]) carry a desired fetch
   *  time `tsMsCol`; each host releases AT MOST ONE candidate per batch
   *  — the earliest (smallest ts, doc-key tiebreak via urlCol) whose
   *  time has reached the host's `next_eligible_ms` — and everything
   *  else defers. Output = input columns + `host` +
   *  `next_eligible_ms` (-1 for a host absent from the ledger = no
   *  politeness debt) + `admitted`.
   *
   *  100 TB shape: one host-keyed join against the ledger (both sides
   *  host-dimension-bounded or stream-batch-bounded; no broadcast hint
   *  — AQE decides, same contract as [[crawlDecide]]'s batch face) and
   *  one host-keyed min_by aggregate over the ELIGIBLE slice only (the
   *  per-batch candidate set), rejoined by (host, url). The URL stream
   *  shuffles once on host — unavoidable: one-fetch-per-host is a
   *  per-host decision. The ledger-joined frame feeds BOTH the winner
   *  aggregate and the final classification, so `checkpointJoined =
   *  true` (what [[frontierGate]] passes — its input is one bounded
   *  micro-batch) localCheckpoints it once instead of re-running the
   *  candidate scan + ledger join per reference; corpus-scale batch
   *  callers pass `false` per the crawlDecide/checkpointCanon
   *  contract (their inputs are theirs to materialize). */
  def frontierAdmit(candidates: DataFrame, urlCol: String, tsMsCol: String,
      ledger: DataFrame, checkpointJoined: Boolean = true): DataFrame = {
    val hosted = candidates
      .withColumn("host", regexp_extract(col(urlCol), CrawlHostRe, 1))
    val joined0 = hosted.join(
        ledger.select(col("host"), col("next_eligible_ms").as("__next")),
        Seq("host"), "left")
      .withColumn("next_eligible_ms", coalesce(col("__next"), lit(-1L)))
      .drop("__next")
      .withColumn("__eligible",
        col(tsMsCol) >= greatest(col("next_eligible_ms"), lit(0L)))
    val joined = if (checkpointJoined) joined0.localCheckpoint() else joined0
    // earliest eligible candidate per host wins the batch's fetch slot;
    // ties break on the url so replays stay deterministic
    val winners = joined.where(col("__eligible"))
      .groupBy(col("host"))
      .agg(expr(s"min_by(struct($tsMsCol, $urlCol), " +
        s"struct($tsMsCol, $urlCol))").as("__w"))
      .select(col("host"), col("__w").getField(tsMsCol).as("__wts"),
        col("__w").getField(urlCol).as("__wurl"))
    joined.join(winners, Seq("host"), "left")
      .withColumn("admitted",
        col("__eligible") && col("__wurl").isNotNull &&
          col(urlCol) === col("__wurl") && col(tsMsCol) === col("__wts"))
      .drop("__eligible", "__wts", "__wurl")
  }

  /**
   * Streaming REVISIT-ACCOUNTING gate — the continuous face of the
   * `pipeline_crawl_revisit` batch flagship: per micro-batch of crawl
   * archives, [[graft.operators.Warc.revisitRecords]] walks response +
   * revisit records and the batch's per-(host, digest) DELTAS —
   * response count, revisit count, response body length — append to
   * `ledgerDir` (the fetch-log discipline: an append-only log the
   * accounting REFOLDS; a replayed batch appends duplicate deltas, so
   * an idempotent sink keys appends by batchId like the other gates).
   * [[revisitAccounting]] folds the ledger to the flagship's per-host
   * rows; gate ≡ batch is spec-pinned on a split log, including a
   * digest whose response and revisits arrive in DIFFERENT batches.
   *
   * 100 TB shape: blobs collapse to slim (host, digest, counts, len)
   * deltas inside the batch before anything persists; the ledger grows
   * by distinct (host, digest) per batch, not capture volume, and the
   * fold is the flagship's two-level aggregate.
   */
  def revisitGate(payloadCol: String,
      ledgerDir: String): (DataFrame, Long) => Unit = (batch, _) => {
    graft.operators.Warc.revisitRecords(batch, payloadCol)
      .select(
        regexp_extract(col("target_uri"), "https://([^/]+)/", 1)
          .as("host"),
        col("warc_type"), col("payload_digest"), col("body_len"))
      .groupBy(col("host"), col("payload_digest"))
      .agg(
        sum(when(col("warc_type") === "response", 1L).otherwise(0L))
          .as("n_resp"),
        sum(when(col("warc_type") === "revisit", 1L).otherwise(0L))
          .as("n_rev"),
        max(when(col("warc_type") === "response", col("body_len")))
          .as("len"))
      .write.mode("append").parquet(ledgerDir)
  }

  /** Fold the [[revisitGate]] ledger to the `pipeline_crawl_revisit`
   *  per-host accounting rows. Digest-level merge runs first — a
   *  digest's captures may arrive across many batches, and its
   *  response may land in a different batch than its revisits — with
   *  `len` max-merged (identical payloads have identical lengths, and
   *  revisit-only deltas carry null). */
  def revisitAccounting(spark: SparkSession,
      ledgerDir: String): DataFrame = {
    val perDigest = spark.read.parquet(ledgerDir)
      .groupBy(col("host"), col("payload_digest"))
      .agg(sum(col("n_resp")).as("n_resp"),
        sum(col("n_rev")).as("n_rev"),
        max(col("len")).as("len"))
    perDigest.groupBy(col("host")).agg(
      sum(col("n_resp") + col("n_rev")).as("n_fetches"),
      sum(col("n_rev")).as("n_revisits"),
      sum(col("n_resp") * col("len")).as("stored_bytes"),
      sum(col("n_rev") * col("len")).as("saved_bytes"))
      .withColumn("saved_ppm",
        expr("saved_bytes * 1000000L div (stored_bytes + saved_bytes)"))
  }

  /** K-WAVE FRONTIER REPLAY — the batch fixed-point face of the
   *  politeness loop: [[frontierAdmit]] certifies ONE wave; a real
   *  frontier re-presents deferred candidates every scheduling tick.
   *  Wave i (0-based) offers every not-yet-admitted candidate at
   *  `tsMsCol + i * waveMs`, each host releases at most its earliest
   *  eligible one, admissions append to the fetch log as completions
   *  at that offered time, [[frontierSchedule]] REFOLDS the ledger
   *  (advancing `next_eligible_ms`), and wave i+1 enforces the new
   *  ledger. Output: the input columns + `host` + `admitted_wave`
   *  (0-based wave of admission, -1 = still deferred after `waves`)
   *  + `fetch_ts_ms` (the admitted offer time, -1 if deferred).
   *
   *  100 TB shape: per wave, ONE host-keyed shuffle of the shrinking
   *  pool + the slim ledger refold; `waves` is a small politeness
   *  constant (bounded at 64), NOT data-driven, so total work is
   *  O(waves × pool). Each wave's decided frame feeds three consumers
   *  (admissions, fetch-log append, the next pool) and is
   *  localCheckpoint'ed — the PageRank-style per-round discipline —
   *  so lineage stays one wave deep; the audit and seed fetch log are
   *  checkpointed once up front (refolded every wave). Corpus-scale
   *  callers materialize `candidates` themselves (the crawlDecide
   *  contract); each wave's pool here descends from the previous
   *  round's checkpoint, never from the raw input twice. */
  def frontierWaves(candidates: DataFrame, urlCol: String, tsMsCol: String,
      audit: DataFrame, fetches: DataFrame, waves: Int,
      waveMs: Long): DataFrame = {
    require(waves >= 1 && waves <= 64,
      s"frontierWaves: waves must be in [1, 64], got $waves")
    require(waveMs > 0L, s"frontierWaves: waveMs must be positive, got $waveMs")
    val auditCk = audit.localCheckpoint()
    var fetchLog = fetches.localCheckpoint()
    var pool = candidates
    var admittedAll: DataFrame = null
    var i = 0
    while (i < waves) {
      val ledger = frontierSchedule(auditCk, fetchLog)
      val offered = pool.withColumn("__offer_ts",
        col(tsMsCol) + lit(i.toLong * waveMs))
      val decided = frontierAdmit(offered, urlCol, "__offer_ts", ledger,
          checkpointJoined = false)
        .localCheckpoint()
      val adm = decided.where(col("admitted"))
      val admOut = adm
        .withColumn("admitted_wave", lit(i))
        .withColumn("fetch_ts_ms", col("__offer_ts"))
        .drop("admitted", "next_eligible_ms", "__offer_ts")
      admittedAll =
        if (admittedAll == null) admOut else admittedAll.unionByName(admOut)
      fetchLog = fetchLog.unionByName(
        adm.select(col("host"), col("__offer_ts").as("fetch_ts_ms")))
      pool = decided.where(!col("admitted"))
        .drop("admitted", "next_eligible_ms", "host", "__offer_ts")
      i += 1
    }
    val deferred = pool
      .withColumn("host", regexp_extract(col(urlCol), CrawlHostRe, 1))
      .withColumn("admitted_wave", lit(-1))
      .withColumn("fetch_ts_ms", lit(-1L))
    admittedAll.unionByName(deferred)
  }

  /**
   * Streaming frontier gate — [[frontierAdmit]] run per micro-batch
   * against the persistent ledger at `ledgerDir` (written by a
   * [[frontierSchedule]] maintenance job): admitted candidates append
   * to `admitDir` AND to the fetch log at `fetchLogDir`
   * (`host, fetch_ts_ms`) — the completion feedback frontierSchedule
   * folds into the next ledger — while deferred candidates append to
   * `deferDir` for requeue. Ledger absent = everything eligible (a
   * cold crawl has no politeness debt). Same replay caveat as every
   * foreachBatch sink here: key writes by `batch_id` for idempotence.
   *
   * Use with `stream.writeStream.foreachBatch(frontierGate(...)).start()`.
   */
  def frontierGate(urlCol: String, tsMsCol: String, ledgerDir: String,
      admitDir: String, deferDir: String, fetchLogDir: String)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger =
      if (fs.exists(ledgerPath)) spark.read.parquet(ledgerDir)
      else {
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("host", "next_eligible_ms")
      }
    // admit + defer + fetch-log consume it: cut the batch-bounded lineage
    val decided = frontierAdmit(batch, urlCol, tsMsCol, ledger)
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint()
    val admitted = decided.where(col("admitted")).drop("admitted")
    admitted.write.mode("append").parquet(admitDir)
    admitted.select(col("host"), col(tsMsCol).as("fetch_ts_ms"))
      .write.mode("append").parquet(fetchLogDir)
    decided.where(!col("admitted")).drop("admitted")
      .write.mode("append").parquet(deferDir)
  }

  /**
   * Streaming ingest-volume monitor — the continuous face of
   * [[graft.operators.Anomaly.volumeSpikes]]: per micro-batch, fold the
   * batch's (group, bucket) event counts into a persistent count history
   * and alert on any bucket THIS batch touched that is now a
   * kNum/kDen-σ outlier against its group's full accumulated history.
   * The z-test is the same integer-cleared form as the batch operator, so
   * an alert replayed in batch (`q_daily_spikes` shape) reproduces the
   * same verdict exactly.
   *
   * State is deliberately NOT watermarked keyed state but an external
   * count table (parquet here; a bucketed table on a cluster): the
   * monitor's history must span the whole corpus lifetime, and its size
   * is groups × time-span/bucket — counts, never events. Per batch: one
   * partial-aggregated count of the batch, one append, one re-aggregate
   * of the (small) history table, one broadcast-joined flag pass.
   * Replays re-append a batch's counts (inflating that bucket), so an
   * idempotent deployment keys `historyDir` writes by batchId per the
   * foreachBatch contract — same caveat as [[nearDedupGate]].
   *
   * Use with `stream.writeStream.foreachBatch(volumeSpikeGate(...)).start()`.
   */
  def volumeSpikeGate(
      tsUsCol: String,
      groupCol: String,
      bucketUs: Long,
      historyDir: String,
      alertDir: String,
      kNum: Long = 5,
      kDen: Long = 2): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.Anomaly
    val spark = batch.sparkSession
    val counts = batch
      .withColumn("bucket_us", col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // appended AND probed below; cut the lineage
    counts.write.mode("append").parquet(historyDir)
    val history = spark.read.parquet(historyDir)
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum("n_events").as("n_events"))
    Anomaly.zscoreOutliers(history, "n_events", groupCol, kNum, kDen, scale = 1L)
      .where(col("is_outlier"))
      .join(counts.select(col(groupCol), col("bucket_us")),
        Seq(groupCol, "bucket_us"), "left_semi")
      .select(col(groupCol), col("bucket_us"), col("n_events"))
      .write.mode("append").parquet(alertDir)
  }

  /**
   * Streaming FUZZY-KEY gate — the continuous face of
   * [[graft.operators.Dedup.fuzzyKeyPairs]]'s entity resolution: per
   * micro-batch, drop every row whose KEY is within edit distance 1 of
   * an already-admitted key (CDC entity dedupe at ingest — typo'd
   * names, OCR'd ids). The persistent index is the deletion
   * neighborhood of the kept corpus: `indexDir` holds (variant, doc)
   * rows — ~|key|+1 short strings per admitted row, the SymSpell index
   * layout — and `outDir` the admitted rows. Per batch: (1) in-batch
   * conservative greedy cut via the batch pair miner (drop the larger
   * id of every verified pair — the [[embeddingDedupGate]] discipline);
   * (2) survivors' variants probe the index, and only the candidate
   * sliver re-reads kept keys (joined from `outDir` by id) for the
   * `levenshtein ≤ 1` verify — blocking completeness means no fuzzy
   * match can slip past the probe; (3) admitted rows append to
   * `outDir`, their variants to `indexDir`.
   *
   * Same caveats as the sibling gates: arrival-order greedy ≡ batch
   * CC-keep-min on id-ordered split logs (spec-pinned); replays key
   * appends by batchId for idempotence.
   */
  def fuzzyKeyGate(
      keyCol: String,
      idCol: String,
      indexDir: String,
      outDir: String): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val variantsExpr = expr(
      "array_union(array(__k), transform(sequence(1, length(__k)), " +
        "i -> concat(substring(__k, 1, i - 1), substring(__k, i + 1))))")
    val inBatch = Dedup.fuzzyKeyPairs(batch, keyCol, idCol)
      .select(col("b").as(idCol)).distinct()
    val afterBatch = batch.join(inBatch, Seq(idCol), "left_anti")
    val kept =
      if (new java.io.File(indexDir).exists) {
        val indexed = spark.read.parquet(indexDir)
        val probes = afterBatch
          .select(col(idCol).as("__id"), col(keyCol).as("__k"))
          .withColumn("__v", explode(variantsExpr))
        val cand = probes.join(indexed, Seq("__v"))
          .select(col("__id"), col("__k"), col("doc")).distinct()
        val keptKeys = spark.read.parquet(outDir)
          .select(col(idCol).as("doc"), col(keyCol).as("__kk"))
        val dropped = cand.join(keptKeys, Seq("doc"))
          .where(levenshtein(col("__k"), col("__kk")) <= 1)
          .select(col("__id").as(idCol)).distinct()
        afterBatch.join(dropped, Seq(idCol), "left_anti").localCheckpoint()
      } else afterBatch.localCheckpoint() // corpus + index appends reuse it
    kept.write.mode("append").parquet(outDir)
    kept.select(col(idCol).as("doc"), col(keyCol).as("__k"))
      .withColumn("__v", explode(variantsExpr))
      .select(col("__v"), col("doc"))
      .write.mode("append").parquet(indexDir)
  }

  /**
   * Seasonal face of [[volumeSpikeGate]] — the continuous
   * [[graft.operators.Anomaly.seasonalSpikes]]: identical persistent
   * count-history fold, but each touched bucket is z-tested against the
   * history of its own PHASE (bucket index mod `periodBuckets`) for its
   * group, so a diurnal corpus alerts on "unusual for 3 am" instead of
   * drowning night-hours bursts in the daily swing. Alert rows carry the
   * phase. Same replay caveat as [[volumeSpikeGate]].
   */
  def seasonalSpikeGate(
      tsUsCol: String,
      groupCol: String,
      bucketUs: Long,
      periodBuckets: Long,
      historyDir: String,
      alertDir: String,
      kNum: Long = 5,
      kDen: Long = 2): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.Anomaly
    val spark = batch.sparkSession
    val counts = batch
      .withColumn("bucket_us", col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // appended AND probed below; cut the lineage
    counts.write.mode("append").parquet(historyDir)
    val history = spark.read.parquet(historyDir)
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum("n_events").as("n_events"))
      .withColumn("phase", expr(s"(bucket_us div $bucketUs) % $periodBuckets"))
      .withColumn("__season", concat_ws("#", col(groupCol), col("phase")))
    Anomaly.zscoreOutliers(history, "n_events", "__season", kNum, kDen,
        scale = 1L)
      .where(col("is_outlier"))
      .join(counts.select(col(groupCol), col("bucket_us")),
        Seq(groupCol, "bucket_us"), "left_semi")
      .select(col(groupCol), col("phase"), col("bucket_us"), col("n_events"))
      .write.mode("append").parquet(alertDir)
  }

  /**
   * Streaming CUSUM drift monitor — the continuous face of
   * [[graft.operators.Anomaly.cusumWithTarget]]: fold each micro-batch's
   * (group, bucket) value sums into the persistent history, recompute the
   * pinned-target CUSUM statistic over the consolidated series, and alert
   * on any bucket THIS batch touched whose statistic crosses the
   * threshold. The pinned calibration (`target`/`allowance`/`threshold`,
   * in ⌊v·scale⌋ units, from a training window) is what makes the
   * statistic a pure fold of the observed sums — so the gate's verdicts
   * equal the batch operator's over the replayed log (spec-pinned), the
   * property the auto-calibrated [[graft.operators.Anomaly.cusum]] can't
   * give a stream (its reference mean drifts with every batch).
   *
   * This catches what [[volumeSpikeGate]] can't: a sustained small level
   * shift (a 10% ingest regression) accumulates into an alarm here while
   * each individual bucket stays inside the z-band. Same external-table
   * state discipline and replay caveat as [[volumeSpikeGate]].
   */
  def cusumGate(
      tsUsCol: String,
      groupCol: String,
      valueCol: String,
      bucketUs: Long,
      scale: Long,
      target: Long,
      allowance: Long,
      threshold: Long,
      historyDir: String,
      alertDir: String): (DataFrame, Long) => Unit = (batch, _) => {
    import graft.operators.Anomaly
    val spark = batch.sparkSession
    val sums = batch
      .withColumn("bucket_us", col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum(floor(col(valueCol).cast("double") * scale).cast("long"))
        .as("__x"))
      .localCheckpoint() // appended AND probed below; cut the lineage
    sums.write.mode("append").parquet(historyDir)
    val history = spark.read.parquet(historyDir)
      .groupBy(col(groupCol), col("bucket_us"))
      .agg(sum("__x").as("__x"))
    Anomaly.cusumWithTarget(history, groupCol, "__x",
        target, allowance, threshold)
      .where(col("is_alarm"))
      .join(sums.select(col(groupCol), col("bucket_us")),
        Seq(groupCol, "bucket_us"), "left_semi")
      .select(col(groupCol), col("bucket_us"), col("x_scaled"), col("cusum"))
      .write.mode("append").parquet(alertDir)
  }

  /**
   * Streaming reference decontamination: drop stream rows whose content
   * already appears in a STATIC reference corpus — the ingest-time face of
   * `Dedup.bloomReference`/`dedup_ref_exact` (filter new shards against
   * the "already trained on" set as they arrive). The static side reduces
   * to distinct 8-byte content hashes ONCE — persisted, because a
   * stream-static join re-executes an uncached static side on EVERY
   * micro-batch — then broadcast per batch; anti semantics use the
   * supported stream-static left-outer + null-filter shape, since
   * stream-static left_anti is not a supported join type. Stateless — no
   * watermark, no streaming state; at 100 TB-reference scale swap the
   * broadcast keys for the Bloom probe column (same plan shape, 8 MiB
   * instead of the key set).
   *
   * Lifecycle: build the key set ONCE with [[referenceKeys]] and bind any
   * number of streams to it with [[decontaminateWith]] — the caller holds
   * the persisted handle and unpersists exactly that when done (query
   * restarts and retries then reuse one cached copy instead of
   * accumulating them). This convenience form persists a fresh key set
   * per call and is for one-shot pipelines only.
   */
  def decontaminate(
      stream: DataFrame, ref: DataFrame, textCol: String): DataFrame =
    decontaminateWith(stream, referenceKeys(ref, textCol), textCol)

  /** The persisted static side of [[decontaminate]]: distinct 8-byte
   *  content hashes of the reference corpus, built once per reference.
   *  The caller owns the returned handle — `unpersist()` it after the
   *  queries bound via [[decontaminateWith]] stop. */
  def referenceKeys(ref: DataFrame, textCol: String): DataFrame =
    ref.select(xxhash64(col(textCol)).as("__h")).distinct()
      .withColumn("__hit", lit(true))
      .persist()

  /** Bind a stream to a prepared [[referenceKeys]] table (broadcast per
   *  micro-batch; anti semantics via left-outer + null-filter). */
  def decontaminateWith(
      stream: DataFrame, refKeys: DataFrame, textCol: String): DataFrame =
    stream.withColumn("__h", xxhash64(col(textCol)))
      .join(broadcast(refKeys), Seq("__h"), "left")
      .where(col("__hit").isNull)
      .drop("__h", "__hit")

  /**
   * Streaming ordered-sequence funnel — the continuous-ingest face of the
   * batch [[graft.operators.Funnel]] (view → click → purchase with
   * first-touch attribution and an optional conversion window). Keyed
   * state per user is the prefix of stage first-touch times reached so
   * far (≤ k longs — bounded, no event buffering), updated by a single
   * event-time-ordered fold per micro-batch; each newly-reached stage
   * emits one (user, stage, first_us) row in Append mode, the same long
   * format [[graft.operators.Funnel.userStages]] produces.
   *
   * Exactness contract: the greedy fold locks each stage's first touch
   * when it is observed, which reproduces the batch result exactly when
   * each user's events arrive in non-decreasing event-time order ACROSS
   * micro-batches (within a batch, arrival order is irrelevant — events
   * are sorted by event time before the fold). Out-of-order arrivals
   * beyond that are the usual streaming-funnel approximation: a late
   * earlier event cannot retract an already-emitted touch (Append mode
   * has no retractions); bound the disorder with the watermark `delay`.
   *
   * 100 TB shape: one shuffle of slim (user, ts, type) rows per batch to
   * co-locate keys; state is k×8 bytes per user that ever entered stage 1
   * (32 B/user at k=4 — ~32 GB of distributed state per 10⁹ users; a
   * production deployment with churning users adds an event-time timeout
   * to evict users whose conversion window has lapsed).
   */
  def streamingFunnel(
      stream: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      delay: String,
      windowUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    windowUs.foreach(w => require(w > 0, "need windowUs > 0"))
    import stream.sparkSession.implicits._
    val stageArr = stages.toArray
    val win = windowUs.getOrElse(Long.MaxValue)
    val events = stream
      .withWatermark(tsCol, delay)
      .select(col(userCol).cast("string"), unix_micros(col(tsCol)),
        col(typeCol).cast("string"))
      .as[(String, Long, String)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (String, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Seq[Long]]) =>
          // state: first-touch µs per reached stage, LATEST FIRST (the
          // fold only ever consults the most recent touch).
          var touched = state.getOption.getOrElse(Seq.empty[Long]).toList
          val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
          rows.toSeq.sortBy(_._2).foreach { case (_, t, tpe) =>
            val k = touched.size
            if (k < stageArr.length && tpe == stageArr(k)) {
              val qualifies =
                if (k == 0) true
                else t > touched.head &&
                  (win == Long.MaxValue || t <= touched.head + win)
              if (qualifies) {
                touched = t :: touched
                out += ((user, s"${k + 1}_$tpe", t))
              }
            }
          }
          if (out.nonEmpty) state.update(touched)
          out.iterator
      }
      .toDF(userCol, "stage", "first_us")
  }

  /**
   * Stateful per-key sequence numbers — the streaming answer to the
   * reference's stateful counter module (T7, reference:
   * tests/modules/rust_wasm32_counter/src/lib.rs:26-54). The batch
   * equivalent is GlobalSequence; on a stream, keyed state via
   * flatMapGroupsWithState carries each key's count across micro-batches
   * (fault-tolerant through checkpointing). Within a micro-batch, rows of
   * a key are numbered in `orderCol` order — the explicit determinism
   * contract the single-threaded reference gets for free.
   *
   * Output: key, orderCol (long), seq (1-based running index per key).
   */
  def sequencedByKey(
      stream: DataFrame,
      keyCol: String,
      orderCol: String): DataFrame = {
    import stream.sparkSession.implicits._
    val pairs = stream.select(col(keyCol).cast("string"), col(orderCol).cast("long"))
      .as[(String, Long)]
    pairs
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val start = state.getOption.getOrElse(0L)
          val sorted = rows.map(_._2).toSeq.sorted
          val out = sorted.zipWithIndex.map { case (ord, i) =>
            (key, ord, start + i + 1)
          }
          state.update(start + sorted.size)
          out.iterator
      }
      .toDF(keyCol, orderCol, "seq")
  }

  /**
   * Streaming face of [[graft.operators.Anomaly.ewmaByKey]]: the per-key
   * integer EWMA carried across micro-batches through keyed state — one
   * running `s` per key, the bounded-state variant of the batch op's
   * whole-history fold. Within a micro-batch rows fold in (ts, id) order;
   * under per-key in-order arrival the emitted values are EXACTLY the
   * batch operator's (spec-checked on a replayed log, the
   * [[streamingFunnel]] discipline). Same non-negativity contract, same
   * `((den−num)·s + num·v) DIV den` recurrence.
   */
  def streamingEwma(
      stream: DataFrame,
      keyCol: String,
      tsUsCol: String,
      valueCol: String,
      idCol: String,
      num: Long = 1,
      den: Long = 4,
      scale: Long = 100L): DataFrame = {
    require(num > 0 && den > num, "need 0 < num < den")
    import stream.sparkSession.implicits._
    val slim = stream.select(
        col(keyCol).cast("long"),
        col(tsUsCol).cast("long"),
        col(idCol).cast("long"),
        floor(col(valueCol).cast("double") * scale).cast("long"))
      .as[(Long, Long, Long, Long)]
    slim.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[Long]) =>
          var s = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toArray.sortBy(e => (e._2, e._3)).map { e =>
            require(e._4 >= 0,
              s"streamingEwma requires non-negative values, got ${e._4}")
            s = if (s == Long.MinValue) e._4
                else ((den - num) * s + num * e._4) / den
            (key, e._3, e._4, s)
          }
          state.update(s)
          out.iterator
      }
      .toDF(keyCol, idCol, "v", "ewma")
  }

  /**
   * Streaming latest-by-key — the CDC/upsert ingest face of the batch
   * `q_latest_by_key` compaction: per key, keep the maximum
   * `(event-time µs, id)` version seen so far and EMIT a row whenever a
   * micro-batch advances it (update semantics: downstream writes the
   * emitted row over the key's previous value). Late rows older than the
   * retained version are absorbed silently — exactly what "keep the
   * newest version" means.
   *
   * State: one `(ts_us, id, payload)` tuple per key — bounded by key
   * cardinality, not event volume (the same budget as a compacted
   * table). After any prefix of the log, emitted-last-per-key equals the
   * batch argmax over that prefix (spec-replayed across micro-batch
   * splits); arrival order never changes the outcome because max is
   * order-free.
   */
  def streamingLatestByKey(
      stream: DataFrame,
      keyCol: String,
      tsUsCol: String,
      idCol: String,
      payloadCol: String): DataFrame = {
    import stream.sparkSession.implicits._
    // A malformed row with a null key/ts/id must not kill the query (the
    // primitive-Long encoder throws on null) — drop it, matching the
    // batch argmax which such a row could never win anyway.
    val slim = stream.select(
        col(keyCol).cast("long"),
        col(tsUsCol).cast("long"),
        col(idCol).cast("long"),
        col(payloadCol).cast("string"))
      .where(col(keyCol).isNotNull && col(tsUsCol).isNotNull &&
        col(idCol).isNotNull)
      .as[(Long, Long, Long, String)]
    slim.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (Long, Long, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[(Long, Long, String)]) =>
          val best0 = state.getOption.getOrElse((Long.MinValue, Long.MinValue, ""))
          val incoming = rows.map(r => (r._2, r._3, r._4))
          val best = (Iterator(best0) ++ incoming).maxBy(t => (t._1, t._2))
          if (best != best0) {
            state.update(best)
            Iterator((key, best._1, best._2, best._3))
          } else Iterator.empty
      }
      .toDF(keyCol, "ts_us", idCol, payloadCol)
  }

  /**
   * Watermarked stream-stream interval join — the ATTRIBUTION shape
   * (impression ⨝ conversion, click ⨝ purchase) joining two live streams
   * on a key with the right event inside `[left.ts, left.ts + horizon]`.
   * This is the streaming face of the batch range join (`q_join_range`)
   * and the two-sided sibling of [[decontaminate]]'s stream-static join.
   *
   * Both sides carry the SAME watermark delay and the join condition
   * time-bounds the match window — together these are precisely what
   * lets Spark evict buffered rows: a left row's state is droppable once
   * the watermark passes `left.ts + horizon`, a right row's once it
   * passes `right.ts`. Without the interval bound the state grows without
   * limit (Spark would reject the stream-stream join outright in append
   * mode) — the bound is not an optimization, it is the feasibility
   * condition for a continuous 100 TB ingest.
   *
   * Column contract: key columns are equated pairwise; all other columns
   * from both sides pass through, so the two frames must not share other
   * names (rename upstream — same rule as Spark's own join API).
   *
   * Admission semantics: a row at or below the CURRENT global watermark
   * is dropped on arrival (standard stateful-operator lateness rule, and
   * the global watermark is the min across both inputs) — the horizon
   * reaches back from an admitted left row, but the row itself must be
   * on time.
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      delay: String,
      horizon: String): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "intervalJoin expects two streaming DataFrames")
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $horizon"))
  }
}
