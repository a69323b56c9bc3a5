package graft

import graft.engine.Pipeline
import graft.streaming.StreamingLens
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured-Streaming lens support: stateless pipelines bind unchanged
 *  (the Socket mapping), event-time/windowed/stateful ops behave. */
class StreamingLensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("stateless lens pipeline runs unchanged on a stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:filter","arguments":{"expr":"qty > 1"}},
        |  {"path":"builtin:with_column","arguments":{"col":"qty2","expr":"qty * 2"}},
        |  {"path":"builtin:rename","arguments":{"src":"name","dst":"item"}}
        |]}""".stripMargin)
    val out = StreamingLens.forward(pipe, in.toDF.toDF("name", "qty"))
    val q = out.writeStream.format("memory").queryName("s_stateless").start()
    try {
      in.addData(("a", 1L), ("b", 2L), ("c", 3L))
      q.processAllAvailable()
      val rows = spark.sql("select item, qty, qty2 from s_stateless order by item")
        .as[(String, Long, Long)].collect().toSeq
      assert(rows == Seq(("b", 2L, 4L), ("c", 3L, 6L)))
    } finally q.stop()
  }

  test("a real .wasm lens stage runs unchanged on a stream (S4 × P5)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val url = "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(
        graft.wasm.LensGuestModules.shiftGuest("qty"))
    val in = MemoryStream[(String, Long)]
    val pipe = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$url","arguments":{"delta":100}}]}""")
    val out = StreamingLens.forward(pipe, in.toDF.toDF("name", "qty"))
    val q = out.writeStream.format("memory").queryName("s_wasm").start()
    try {
      in.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      in.addData(("c", 3L)) // a second micro-batch re-instantiates cleanly
      q.processAllAvailable()
      val rows = spark.sql("select name, qty from s_wasm order by name")
        .as[(String, Long)].collect().toSeq
      assert(rows == Seq(("a", 101L), ("b", 102L), ("c", 103L)))
    } finally q.stop()
  }

  test("batch-only ops are rejected eagerly with the op name") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Long)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:sort","arguments":{"cols":["name"]}}]}""")
    val e = intercept[IllegalArgumentException] {
      StreamingLens.forward(pipe, in.toDF.toDF("name", "qty"))
    }
    assert(e.getMessage.contains("sort"))
  }

  test("event-time window agg with watermark: late data beyond delay dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val out = StreamingLens.eventWindowAgg(
      in.toDF.toDF("ts", "k", "v"), "ts", "10 seconds", "30 seconds",
      Seq("k"), Seq("sum(v) as total", "count(1) as n"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("s_window").start()
    try {
      in.addData((ts(5), "a", 1L), (ts(10), "a", 2L), (ts(100), "a", 10L))
      q.processAllAvailable()
      // watermark now 100-10=90s → the [0,30) window is finalized
      in.addData((ts(7), "a", 100L)) // late beyond the watermark: dropped
      in.addData((ts(110), "a", 20L))
      q.processAllAvailable()
      val totals = spark.sql(
        "select window.start, total, n from s_window")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (w, rs) => w -> rs.maxBy(_._3) }
      // [0,30) kept only the on-time rows 1+2
      assert(totals(0L)._2 == 3L && totals(0L)._3 == 2L)
      // [90,120) has 10+20
      assert(totals(90L)._2 == 30L && totals(90L)._3 == 2L)
    } finally q.stop()
  }

  test("streaming dedup: duplicate ids across micro-batches dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingLens.streamingDedup(
      in.toDF.toDF("ts", "id", "payload"), "ts", "1 minute", Seq("id"))
    val q = out.writeStream.format("memory").queryName("s_dedup").start()
    try {
      in.addData((ts(1), 1L, "x"), (ts(2), 2L, "y"))
      q.processAllAvailable()
      // id 1 again — at a DIFFERENT event time — still a duplicate
      in.addData((ts(9), 1L, "x2"), (ts(3), 3L, "z"))
      q.processAllAvailable()
      val ids = spark.sql("select id from s_dedup").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static decontamination: reference content dropped every micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ref = Seq("seen one", "seen two").toDF("text")
    val in = MemoryStream[(Long, String)]
    val out = StreamingLens.decontaminate(in.toDF.toDF("doc_id", "text"), ref, "text")
    val q = out.writeStream.format("memory").queryName("s_decon").start()
    try {
      in.addData((1L, "fresh alpha"), (2L, "seen one"))
      q.processAllAvailable()
      // reference filtering must hold on LATER batches too (static side
      // re-broadcast per micro-batch)
      in.addData((3L, "seen two"), (4L, "fresh beta"), (5L, "seen one"))
      q.processAllAvailable()
      val kept = spark.sql("select doc_id from s_decon").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 4L))
    } finally q.stop()
  }

  test("session windows: replayed log matches batch sessionize output") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // Two users; u1 has two sessions split by a >30s gap, u2 one session.
    // No inter-event gap sits exactly AT the 30s boundary (where streaming
    // `session_window` and the batch `> gap` rule legitimately differ —
    // see sessionWindowAgg scaladoc).
    val events = Seq(
      ("u1", 0L), ("u1", 10L), ("u1", 20L),  // session 1: 3 events, 20s
      ("u1", 100L), ("u1", 105L),            // session 2: 2 events, 5s
      ("u2", 50L))                           // session 1: 1 event
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamingLens.sessionWindowAgg(
      in.toDF.toDF("uid", "ts"), "ts", "10 seconds", "30 seconds",
      Seq("uid"), Seq("count(1) as n_events",
        "cast(unix_millis(max(ts)) - unix_millis(min(ts)) as bigint) as duration_ms"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("s_sessions").start()
    try {
      events.foreach { case (u, s) => in.addData((u, ts(s))) }
      in.addData(("u2", ts(1000L))) // advance watermark far past all sessions
      q.processAllAvailable()
      val streamed = spark.sql(
        """select uid, n_events, duration_ms,
          |  rank() over (partition by uid order by session_window.start) as session_seq
          |from s_sessions""".stripMargin)
        .as[(String, Long, Long, Int)].collect()
        .map(r => ((r._1, r._4.toLong), (r._2, r._3))).toMap

      // batch reference on the same replayed log (ts in ms units, gap 30s)
      val batchDf = events.toDF("uid", "s")
        .select(col("uid"), (col("s") * 1000).as("ts_ms"))
      val batch = graft.operators.Sessionize.stats(
        graft.operators.Sessionize.assign(batchDf, "uid", "ts_ms", 30000L, "ts_ms"),
        "uid", "ts_ms")
        .as[(String, Long, Long, Long)].collect()
        .map(r => ((r._1, r._2), (r._3, r._4))).toMap

      assert(streamed.nonEmpty)
      // every CLOSED streaming session matches the batch session exactly
      // (the u2 watermark-advancing event's own session may still be open)
      streamed.foreach { case (k, v) =>
        assert(batch(k) == v, s"session $k: stream $v vs batch ${batch(k)}")
      }
      assert(streamed.contains(("u1", 1L)) && streamed.contains(("u1", 2L)) &&
        streamed.contains(("u2", 1L)))
    } finally q.stop()
  }

  test("sequencedByKey: per-key sequence persists across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val out = StreamingLens.sequencedByKey(in.toDF.toDF("k", "ord"), "k", "ord")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("s_seq").start()
    try {
      in.addData(("a", 10L), ("a", 5L), ("b", 1L))
      q.processAllAvailable()
      in.addData(("a", 20L), ("b", 2L))
      q.processAllAvailable()
      val rows = spark.sql("select k, ord, seq from s_seq")
        .as[(String, Long, Long)].collect().toSet
      // batch 1: a's rows numbered in ord order (5→1, 10→2); b: 1
      // batch 2 continues: a 20→3, b 2→2
      assert(rows == Set(
        ("a", 5L, 1L), ("a", 10L, 2L), ("a", 20L, 3L),
        ("b", 1L, 1L), ("b", 2L, 2L)))
    } finally q.stop()
  }

  test("keyed state survives the state-store provider swap: dedup and " +
      "per-key sequencing behave identically under RocksDBStateStoreProvider " +
      "(the 100 TB streaming-state tier) and the HDFS-backed default") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    def dedupRun(qn: String): Seq[Long] = {
      val in = MemoryStream[(Timestamp, Long, String)]
      val out = StreamingLens.streamingDedup(
        in.toDF.toDF("ts", "id", "payload"), "ts", "1 minute", Seq("id"))
      val q = out.writeStream.format("memory").queryName(qn).start()
      try {
        in.addData((ts(1), 1L, "x"), (ts(2), 2L, "y"))
        q.processAllAvailable()
        in.addData((ts(9), 1L, "x2"), (ts(3), 3L, "z")) // cross-batch dup
        q.processAllAvailable()
        spark.sql(s"select id from $qn").as[Long].collect().sorted.toSeq
      } finally q.stop()
    }
    def seqRun(qn: String): Set[(String, Long, Long)] = {
      val in = MemoryStream[(String, Long)]
      val out = StreamingLens.sequencedByKey(in.toDF.toDF("k", "ord"), "k", "ord")
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(qn).start()
      try {
        in.addData(("a", 10L), ("a", 5L), ("b", 1L))
        q.processAllAvailable()
        in.addData(("a", 20L), ("b", 2L)) // state must carry the counters
        q.processAllAvailable()
        spark.sql(s"select k, ord, seq from $qn")
          .as[(String, Long, Long)].collect().toSet
      } finally q.stop()
    }
    val prev = spark.conf.getOption(key)
    val (dedupHdfs, seqHdfs) = (dedupRun("ss_hdfs_d"), seqRun("ss_hdfs_s"))
    try {
      spark.conf.set(key, rocks)
      val (dedupRocks, seqRocks) = (dedupRun("ss_rocks_d"), seqRun("ss_rocks_s"))
      assert(dedupRocks == dedupHdfs,
        s"dedup state diverged under RocksDB: $dedupRocks vs $dedupHdfs")
      assert(seqRocks == seqHdfs,
        s"per-key sequence state diverged under RocksDB: $seqRocks vs $seqHdfs")
      assert(dedupHdfs == Seq(1L, 2L, 3L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("crawl ingest binds free to a stream: warc.gz record explode -> " +
      "HTML extraction runs unchanged per micro-batch (stateless " +
      "mapPartitions chain, no watermark needed)") {
    import graft.operators.Warc
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def warcOf(id: Long, html: String): Array[Byte] =
      Warc.encodeWarcGz(Seq(
        (Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"https://x.test/$id"),
          Warc.httpResponse(html.getBytes("UTF-8")))))
    val in = MemoryStream[(Long, Array[Byte])]
    val out = Warc.records(in.toDF.toDF("doc_id", "payload"), "payload")
      .where(col("warc_type") === "response")
      .select(col("doc_id"),
        org.apache.spark.sql.graft.HtmlText.extract(col("body")).as("text"))
    val q = out.writeStream.format("memory").queryName("s_crawl").start()
    try {
      in.addData((1L, warcOf(1, "<p>first page</p>")))
      q.processAllAvailable()
      in.addData((2L, warcOf(2, "<h1>t</h1><p>second &amp; third</p>")))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, text from s_crawl")
        .as[(Long, String)].collect().toMap
      assert(rows == Map(1L -> "first page", 2L -> "t\nsecond & third"))
    } finally q.stop()
  }

  test("crash recovery: a stateful dedup gate stopped between micro-batches " +
      "and restarted from the SAME checkpoint admits exactly the " +
      "uninterrupted run's set (exactly-once across restart), under both " +
      "the HDFS-backed and RocksDB state-store providers") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val batch1 = Seq((ts(1), 1L, "x"), (ts(2), 2L, "y"))
    // batch 2 re-offers ids 1 and 2 (cross-RESTART dups: the keyed state
    // that rejects them lives in the recovered checkpoint) plus fresh id 3
    val batch2 = Seq((ts(9), 1L, "x2"), (ts(3), 3L, "z"), (ts(4), 2L, "y2"))
    def restartRun(tag: String): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_recov_$tag")
      val ckpt = dir.resolve("ckpt").toString
      val outp = dir.resolve("out").toString
      val in = MemoryStream[(Timestamp, Long, String)]
      val out = StreamingLens.streamingDedup(
        in.toDF.toDF("ts", "id", "payload"), "ts", "1 minute", Seq("id"))
      def start() = out.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outp).start()
      val q1 = start()
      try { in.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
      // the gate is DOWN here (stopped between micro-batches); restart
      // must rebuild the dedup state from the checkpoint, not from scratch
      val q2 = start()
      try { in.addData(batch2: _*); q2.processAllAvailable() } finally q2.stop()
      spark.read.parquet(outp).select("id").as[Long].collect().sorted.toSeq
    }
    def uninterruptedRun(qn: String): Seq[Long] = {
      val in = MemoryStream[(Timestamp, Long, String)]
      val out = StreamingLens.streamingDedup(
        in.toDF.toDF("ts", "id", "payload"), "ts", "1 minute", Seq("id"))
      val q = out.writeStream.format("memory").queryName(qn).start()
      try {
        in.addData(batch1: _*); q.processAllAvailable()
        in.addData(batch2: _*); q.processAllAvailable()
        spark.sql(s"select id from $qn").as[Long].collect().sorted.toSeq
      } finally q.stop()
    }
    val prev = spark.conf.getOption(key)
    try {
      val wantHdfs = uninterruptedRun("recov_ref_hdfs")
      val gotHdfs = restartRun("hdfs")
      assert(gotHdfs == wantHdfs,
        s"restart changed the admitted set (HDFS provider): $gotHdfs vs $wantHdfs")
      assert(gotHdfs == Seq(1L, 2L, 3L)) // no dup admitted twice, none lost
      spark.conf.set(key, rocks)
      val gotRocks = restartRun("rocks")
      assert(gotRocks == wantHdfs,
        s"restart changed the admitted set (RocksDB provider): $gotRocks vs $wantHdfs")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("referenceKeys handle: caller builds once, binds, and unpersists exactly it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ref = Seq("seen one").toDF("text")
    val refKeys = StreamingLens.referenceKeys(ref, "text")
    val in = MemoryStream[(Long, String)]
    val out = StreamingLens.decontaminateWith(
      in.toDF.toDF("doc_id", "text"), refKeys, "text")
    val q = out.writeStream.format("memory").queryName("s_decon_keys").start()
    try {
      in.addData((1L, "fresh"), (2L, "seen one"))
      q.processAllAvailable()
      val kept = spark.sql("select doc_id from s_decon_keys")
        .as[Long].collect().toSeq
      assert(kept == Seq(1L))
      assert(refKeys.storageLevel.useMemory)
    } finally q.stop()
    refKeys.unpersist(blocking = true)
    assert(!refKeys.storageLevel.useMemory)
  }

  test("C4 line cleaning binds free to a stream (builtin:c4_clean)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:c4_clean","arguments":{"min_line_words":"3",
        |    "min_kept_lines":"1"}},
        |  {"path":"builtin:filter","arguments":{"expr":"c4_pass"}}
        |]}""".stripMargin)
    val out = StreamingLens.forward(pipe, in.toDF.toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("s_c4").start()
    try {
      in.addData(
        (1L, "The cat sat on the mat.\nno terminal punctuation here"),
        (2L, "function f() { return 1; }"))  // brace fails the page
      q.processAllAvailable()
      // stateless per-row projection: later micro-batches clean identically
      in.addData((3L, "A quick brown fox jumps!"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, n_kept, clean_text from s_c4")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(rows.map(_._1) == Seq(1L, 3L))
      assert(rows(0)._2 == 1L &&
        rows(0)._3 == "The cat sat on the mat.",
        "the unpunctuated line drops inside the stream")
    } finally q.stop()
  }

  test("gopher filtering binds free to a stream (builtin:gopher_rules)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:gopher_rules","arguments":{"min_words":"3"}},
        |  {"path":"builtin:filter","arguments":{"expr":"gopher_pass"}}
        |]}""".stripMargin)
    val out = StreamingLens.forward(pipe, in.toDF.toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("s_gopher").start()
    try {
      in.addData(
        (1L, "the cat sat on the mat and purred"),
        (2L, "hi"))  // below min_words: fails the rule set
      q.processAllAvailable()
      // stateless per-row projection: later micro-batches filter identically
      in.addData((3L, "a quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val kept = spark.sql("select doc_id from s_gopher")
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L))
    } finally q.stop()
  }

  test("fractional upsampling binds free to a stream (builtin:upsample)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:upsample",
        |  "arguments":{"group":"src","rates":{"hot":"2.0"},"default":"1.0"}}]}""".stripMargin)
    val out = StreamingLens.forward(pipe, in.toDF.toDF("doc_id", "src"))
    val q = out.writeStream.format("memory").queryName("s_upsample").start()
    try {
      in.addData((1L, "hot"), (2L, "cold"))
      q.processAllAvailable()
      in.addData((3L, "hot"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, copy from s_upsample")
        .as[(Long, Long)].collect().toSet
      // integer rate 2.0 → exactly two copies of every 'hot' row, one of
      // the rest — deterministic, and identical across micro-batches
      assert(rows == Set(
        (1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L), (3L, 1L)))
    } finally q.stop()
  }

  test("streaming simhash dedup: signature clones across micro-batches dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingLens.streamingSimhashDedup(
      in.toDF.toDF("ts", "doc_id", "text"), "ts", "10 minutes", "text")
    val q = out.writeStream.format("memory").queryName("s_simdedup").start()
    try {
      in.addData((ts(10), 1L, "alpha beta gamma"), (ts(11), 2L, "totally different text"))
      q.processAllAvailable()
      // same token profile as doc 1 (identical tokens => identical SimHash
      // signature) arriving a batch later: dropped; fresh content kept
      in.addData((ts(20), 3L, "alpha beta gamma"), (ts(21), 4L, "another new document"))
      q.processAllAvailable()
      val kept = spark.sql("select doc_id from s_simdedup").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      // parity with the batch signature: doc 3 collides with doc 1 there too
      val sigs = graft.operators.Dedup.simHashSignatures(
        Seq((1L, "alpha beta gamma"), (3L, "alpha beta gamma"))
          .toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(sigs(1L) == sigs(3L))
    } finally q.stop()
  }

  // ---- embedding near-dedup gate (residual-PQ index) ----

  /** 8-d fixture: three orthogonal anchors + near-dup variants, plus the
   *  small model (2 cells, m=4/ksub=4) trained on the full log — the
   *  production discipline: the quantizer is trained on the corpus the
   *  gate protects, then shared by every batch. */
  private object EmbFixture {
    val vA = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val vB = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val vC = Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    val vA2 = Seq(0.995f, 0.005f, 0f, 0f, 0f, 0f, 0f, 0.005f) // near A
    val vC2 = Seq(0f, 0.004f, 0.996f, 0f, 0.004f, 0f, 0f, 0f) // near C
    val log = Seq((1L, vA), (2L, vB), (3L, vA2), (4L, vC), (5L, vC2))
    def model(spark: org.apache.spark.sql.SparkSession)
        : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
      import spark.implicits._
      val train = log.toDF("vec_id", "embedding")
      val cents = graft.operators.Kmeans.train(train, "embedding", "vec_id",
        k = 2, iters = 2)
      (cents, graft.operators.Pq.trainResidual(train, "embedding", "vec_id",
        cents, m = 4, ksub = 4, iters = 2))
    }
    val adcTau = 0.3
    val exactTau = 0.9
  }

  test("embedding near-dedup gate: in-batch and cross-batch semantic dups " +
      "dropped against the residual-PQ index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import EmbFixture._
    val (cents, cbs) = model(spark)
    val root = java.nio.file.Files.createTempDirectory("embdedup").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF.toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingLens.embeddingDedupGate("embedding", "vec_id",
        cents, cbs, idx, out, adcTau, exactTau))
      .start()
    try {
      in.addData((1L, vA), (2L, vB))
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
        == Set(1L, 2L))
      // batch 2: 3 ~ indexed 1 (cross-batch drop); 4 new; 5 ~ 4 (in-batch
      // drop — its verified pair has the smaller id in the SAME batch)
      in.addData((3L, vA2), (4L, vC), (5L, vC2))
      q.processAllAvailable()
      val kept = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L), s"gate kept $kept")
      // the index carries exactly the kept codes, in the production layout
      val indexed = spark.read.parquet(idx)
      assert(indexed.columns.toSet == Set("doc", "cell", "codes"))
      assert(indexed.select("doc").as[Long].collect().toSet == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("embedding gate ≡ batch ann-dedup funnel on an id-ordered split log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import EmbFixture._
    val (cents, cbs) = model(spark)
    // batch funnel over the FULL log: pair miner -> CC -> min-id survivors
    val full = log.toDF("vec_id", "embedding")
    val idxFull = graft.operators.Pq.encodeResidual(full, "embedding",
      "vec_id", cents, cbs)
    val pairs = graft.operators.Pq.residualNearDupPairs(idxFull, full,
      "embedding", "vec_id", cents, cbs, adcTau, exactTau)
    val cc = graft.operators.Clusters.connectedComponents(pairs, "a", "b")
    val batchDropped = cc.where(col("node") =!= col("cluster"))
      .select(col("node").cast("long")).as[Long].collect().toSet
    val batchSurvivors = log.map(_._1).toSet -- batchDropped
    // gate over the same log split into two micro-batches (id order, so
    // arrival-order greedy and CC keep-min agree)
    val root = java.nio.file.Files.createTempDirectory("embparity").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF.toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingLens.embeddingDedupGate("embedding", "vec_id",
        cents, cbs, idx, out, adcTau, exactTau))
      .start()
    try {
      in.addData(log.take(2): _*); q.processAllAvailable()
      in.addData(log.drop(2): _*); q.processAllAvailable()
      val gateKept = spark.read.parquet(out).select("vec_id").as[Long]
        .collect().toSet
      assert(gateKept == batchSurvivors,
        s"gate $gateKept != batch funnel $batchSurvivors")
      assert(batchDropped.nonEmpty, "fixture drifted: funnel found no dups")
    } finally q.stop()
  }

  test("banded near-dedup gate: hamming<=3 variants dropped across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("neardedup").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingLens.nearDedupGate("text", "doc_id", idx, out))
      .start()
    try {
      // doc 3 = doc 1 with one token swapped (tok6 → tokX): measured
      // signature hamming 3 — inside the gate's radius but NOT
      // signature-exact, so this exercises the banded search, not the
      // hamming-0 fast path
      val base = (1 to 40).map(i => s"tok$i").mkString(" ")
      val variant = ((1 to 40).filter(_ != 6).map(i => s"tok$i") :+ "tokX").mkString(" ")
      in.addData((1L, base), (2L, "completely unrelated content right here"))
      q.processAllAvailable()
      in.addData((3L, variant), (4L, "yet another brand new page"))
      q.processAllAvailable()
      val sigs = graft.operators.Dedup.simHashSignatures(
        Seq((1L, base), (3L, variant)).toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      val dist = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
      assert(dist > 0 && dist <= 3, s"fixture drifted: hamming $dist not in 1..3")
      val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      // the index carries exactly the kept signatures
      val indexed = spark.read.parquet(idx).select("doc").as[Long].collect().toSet
      assert(indexed == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("media near-dedup gate: REAL codec payloads (BMP/PNG) collapse " +
      "to signatures in-batch and near-dup images drop across " +
      "micro-batches and across FORMATS (same pixels, different codec)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.Multimodal
    val root = java.nio.file.Files.createTempDirectory("mediadedup").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    // 8x8 images with structurally DISTINCT bright/dark patterns (aHash
    // thresholds against the mean, so only the binary structure counts)
    def rgbOf(bright: (Int, Int) => Boolean): Array[Byte] =
      Array.tabulate[Byte](8 * 8 * 3) { i =>
        val px = i / 3
        (if (bright(px % 8, px / 8)) 230 else 10).toByte
      }
    val vSplit = rgbOf((x, _) => x < 4)
    val bmp1 = Multimodal.Containers.encodeBmp(8, 8, vSplit)
    val png1 = Multimodal.Png.encodePng(8, 8, vSplit) // same pixels!
    val bmp2 = Multimodal.Containers.encodeBmp(8, 8, rgbOf((_, y) => y < 4))
    val png3 = Multimodal.Png.encodePng(8, 8, rgbOf((x, y) => (x + y) % 2 == 0))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = in.toDF.toDF("doc_id", "payload").writeStream
      .foreachBatch(StreamingLens.mediaDedupGate("payload", "doc_id", idx, out))
      .start()
    try {
      in.addData((1L, bmp1), (2L, bmp2))
      q.processAllAvailable()
      // doc 3: the SAME pixels as doc 1 but PNG-encoded — the decode
      // path differs, the signature must not (cross-format near-dup);
      // doc 4 is genuinely new
      in.addData((3L, png1), (4L, png3))
      q.processAllAvailable()
      val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L),
        s"cross-format media dup not dropped: $kept")
      val indexed = spark.read.parquet(idx).select("doc").as[Long].collect().toSet
      assert(indexed == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("volume-spike gate: burst bucket alerts; verdict matches the batch operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("volspike").toString
    val (hist, alerts) = (s"$root/history", s"$root/alerts")
    val day = 86400000000L
    val in = MemoryStream[(String, Long)]
    val q = in.toDF.toDF("g", "ts_us").writeStream
      .foreachBatch(StreamingLens.volumeSpikeGate("ts_us", "g", day, hist, alerts))
      .start()
    try {
      // batch 1: ten quiet days of 10 events — uniform history, no alert
      in.addData((for (d <- 0 until 10; i <- 0 until 10) yield ("x", d * day + i)): _*)
      q.processAllAvailable()
      assert(!new java.io.File(alerts).exists ||
        spark.read.parquet(alerts).count() == 0)
      // batch 2: a 100-event burst day (~3.2σ against the history)
      in.addData((for (i <- 0 until 100) yield ("x", 10 * day + i)): _*)
      q.processAllAvailable()
      val got = spark.read.parquet(alerts)
        .select("g", "bucket_us", "n_events")
        .as[(String, Long, Long)].collect().toSet
      assert(got == Set(("x", 10 * day, 100L)))
      // the streaming verdict == the batch operator over the replayed log
      val replayed = ((for (d <- 0 until 10; i <- 0 until 10) yield ("x", d * day + i)) ++
        (for (i <- 0 until 100) yield ("x", 10 * day + i))).toDF("g", "ts_us")
      val batchSpikes = graft.operators.Anomaly
        .volumeSpikes(replayed, "ts_us", "g", day)
        .where(col("is_outlier"))
        .select("g", "bucket_us", "n_events")
        .as[(String, Long, Long)].collect().toSet
      assert(batchSpikes == got)
    } finally q.stop()
  }

  test("fuzzy-key gate: in-batch and cross-batch ed<=1 keys dropped " +
      "against the deletion-neighborhood index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("fuzzygate").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("id", "k").writeStream
      .foreachBatch(StreamingLens.fuzzyKeyGate("k", "id", idx, out))
      .start()
    try {
      // batch 1: 2 is a substitution-twin of 1 (in-batch drop); 10 far
      in.addData((1L, "alpha"), (2L, "alpho"), (10L, "omega"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("id").as[Long].collect().toSet
        == Set(1L, 10L))
      // batch 2: 3 ~ kept "alpha" by insertion (cross-batch drop);
      // 4 ~ kept "omega" by deletion; 5 genuinely new
      in.addData((3L, "alphas"), (4L, "omeg"), (5L, "zeta"))
      q.processAllAvailable()
      val kept = spark.read.parquet(out).select("id").as[Long].collect().toSet
      assert(kept == Set(1L, 10L, 5L), s"gate kept $kept")
      // the index is the deletion neighborhood of exactly the kept keys
      val indexed = spark.read.parquet(idx)
      assert(indexed.columns.toSet == Set("__v", "doc"))
      assert(indexed.select("doc").as[Long].collect().toSet
        == Set(1L, 10L, 5L))
    } finally q.stop()
  }

  test("seasonal spike gate: night burst alerts against its phase; " +
      "verdict matches the batch operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("seaspike").toString
    val (hist, alerts) = (s"$root/history", s"$root/alerts")
    val hour = 3600000000L; val day = 24 * hour
    // the AnomalySpec diurnal fixture, split: days 0-8 baseline, then the
    // day-9 batch with the noon peak AND the 3am burst (40 vs μ=10 phase
    // history — invisible to the global test, 3σ against its phase)
    val baseline =
      (for (d <- 0 until 9; i <- 0 until 100) yield ("x", d * day + 12 * hour + i)) ++
        (for (d <- 0 until 9; i <- 0 until 10) yield ("x", d * day + 3 * hour + i))
    val day9 =
      (for (i <- 0 until 100) yield ("x", 9 * day + 12 * hour + i)) ++
        (for (i <- 0 until 40) yield ("x", 9 * day + 3 * hour + i))
    val in = MemoryStream[(String, Long)]
    val q = in.toDF.toDF("g", "ts_us").writeStream
      .foreachBatch(StreamingLens.seasonalSpikeGate("ts_us", "g", hour, 24,
        hist, alerts))
      .start()
    try {
      in.addData(baseline: _*); q.processAllAvailable()
      assert(!new java.io.File(alerts).exists ||
        spark.read.parquet(alerts).count() == 0)
      in.addData(day9: _*); q.processAllAvailable()
      val got = spark.read.parquet(alerts)
        .select("g", "phase", "bucket_us", "n_events")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("x", 3L, 9 * day + 3 * hour, 40L)))
      // streaming verdict == batch seasonalSpikes over the replayed log
      val replayed = (baseline ++ day9).toDF("g", "ts_us")
      val batchSpikes = graft.operators.Anomaly
        .seasonalSpikes(replayed, "ts_us", "g", hour, 24)
        .where(col("is_outlier"))
        .select("g", "phase", "bucket_us", "n_events")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(batchSpikes == got)
    } finally q.stop()
  }

  test("cusum gate: a sustained small level shift accumulates ACROSS " +
      "micro-batches into an alarm; verdicts equal the pinned-target " +
      "batch operator over the replayed log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("cusumgate").toString
    val (hist, alerts) = (s"$root/history", s"$root/alerts")
    val day = 86400000000L
    // calibration: target 100/day, allowance 10, threshold 50 (scale 1).
    // days 0-9 at the target level; days 10-19 at 120 (+20%, each day
    // d = +10): S reaches 50 at day 14 (no alarm, strict >) and alarms
    // from day 15 on. The shift SPANS batches 2 and 3 — the statistic
    // must carry.
    def evs(d0: Int, d1: Int, v: Double) =
      (d0 until d1).map(d => ("x", d * day, v))
    val in = MemoryStream[(String, Long, Double)]
    val q = in.toDF.toDF("g", "ts_us", "v").writeStream
      .foreachBatch(StreamingLens.cusumGate("ts_us", "g", "v",
        bucketUs = day, scale = 1L, target = 100L, allowance = 10L,
        threshold = 50L, historyDir = hist, alertDir = alerts))
      .start()
    try {
      in.addData(evs(0, 10, 100.0): _*); q.processAllAvailable()
      assert(!new java.io.File(alerts).exists ||
        spark.read.parquet(alerts).count() == 0)
      in.addData(evs(10, 15, 120.0): _*); q.processAllAvailable()
      assert(spark.read.parquet(alerts).count() == 0,
        "S <= threshold through day 14: no alarm yet")
      in.addData(evs(15, 20, 120.0): _*); q.processAllAvailable()
      val got = spark.read.parquet(alerts)
        .select("g", "bucket_us", "x_scaled", "cusum")
        .as[(String, Long, Long, Long)].collect().toSet
      val expect = (15 until 20).map(d =>
        ("x", d * day, 120L, (d - 9) * 10L)).toSet
      assert(got == expect, s"gate alerts $got")
      // gate ≡ batch: pinned-target CUSUM over the consolidated history
      val replayed = (evs(0, 10, 100.0) ++ evs(10, 20, 120.0))
        .toDF("g", "ts_us", "v")
        .groupBy(col("g"), col("ts_us").as("bucket_us"))
        .agg(org.apache.spark.sql.functions.sum(
          floor(col("v") * 1L).cast("long")).as("__x"))
      val batch = graft.operators.Anomaly
        .cusumWithTarget(replayed, "g", "__x", 100L, 10L, 50L)
        .where(col("is_alarm"))
        .select("g", "bucket_us", "x_scaled", "cusum")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming funnel: in-order replayed log matches the batch funnel") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val stages = Seq("view", "click", "purchase")
    val winUs = Some(7L * 24 * 3600 * 1000000) // 7-day conversion window

    // Batch truth over the real event log (µs column, as SessionQueries).
    val batchIn = graft.queries.T(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 as us", "event_type")
    def batchStages(w: Option[Long]) =
      graft.operators.Funnel.userStages(batchIn, "user_id", "us", "event_type",
        stages, w)
        .selectExpr("cast(user_id as string)", "stage", "first_us")
        .as[(String, String, Long)].collect().toSet

    // Replay the same log in two micro-batches split at the median event
    // time: per-user event-time order is preserved across batches, the
    // regime where the greedy fold is exact.
    val log = batchIn.selectExpr("user_id", "us", "event_type")
      .as[(Long, Long, String)].collect().sortBy(_._2)
    val mid = log(log.length / 2)._2
    def toRow(e: (Long, Long, String)) = {
      val t = new Timestamp((e._2 / 1000000) * 1000)
      t.setNanos((e._2 % 1000000).toInt * 1000)
      (e._1, t, e._3)
    }
    for ((w, sink) <- Seq((None, "s_funnel"), (winUs, "s_funnel_w"))) {
      val in = MemoryStream[(Long, Timestamp, String)]
      val out = StreamingLens.streamingFunnel(
        in.toDF.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages, "1 hour", w)
      val q = out.writeStream.format("memory").queryName(sink).start()
      try {
        in.addData(log.filter(_._2 <= mid).map(toRow).toSeq)
        q.processAllAvailable()
        in.addData(log.filter(_._2 > mid).map(toRow).toSeq)
        q.processAllAvailable()
        val got = spark.sql(s"select user_id, stage, first_us from $sink")
          .as[(String, String, Long)].collect().toSet
        assert(got == batchStages(w), s"window=$w")
        // the per-stage report is the groupBy of the emitted long format
        val report = got.groupBy(_._2).view.mapValues(_.size).toMap
        val want = graft.operators.Funnel.report(
          batchIn, "user_id", "us", "event_type", stages, w)
          .as[(String, Long)].collect().map { case (s, n) => s -> n.toInt }.toMap
        assert(report == want, s"report window=$w")
      } finally q.stop()
    }
  }

  test("streaming latest-by-key: emitted-last == batch argmax on a " +
      "split, out-of-order replayed log; stale rows emit nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // key 1: versions at 10, 30 (update), then a LATE 20 (absorbed);
    // key 2: one version.
    val in = MemoryStream[(Long, Long, Long, String)]
    val out = StreamingLens.streamingLatestByKey(
      in.toDF.toDF("user_id", "ts_us", "event_id", "payload"),
      "user_id", "ts_us", "event_id", "payload")
    val q = out.writeStream.format("memory").queryName("s_latest")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, 10L, 100L, "v1"), (2L, 50L, 200L, "w1")))
      q.processAllAvailable()
      in.addData(Seq((1L, 30L, 101L, "v2")))
      q.processAllAvailable()
      in.addData(Seq((1L, 20L, 102L, "late"))) // older than retained 30
      q.processAllAvailable()
      val emitted = spark.sql("select * from s_latest")
        .as[(Long, Long, Long, String)].collect()
      // three emissions total: two initial + one update, no stale emit
      assert(emitted.length == 3)
      val last = emitted.groupBy(_._1).view
        .mapValues(_.maxBy(r => (r._2, r._3))).toMap
      val batchLast = Seq((1L, 10L, 100L, "v1"), (2L, 50L, 200L, "w1"),
          (1L, 30L, 101L, "v2"), (1L, 20L, 102L, "late"))
        .groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3))).toMap
      assert(last == batchLast)
    } finally q.stop()
  }

  test("streaming EWMA matches the batch fold on an in-order replayed log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val log = Seq(
      (1L, 10L, 1L, 1.00), (1L, 20L, 2L, 2.00), (1L, 30L, 3L, 3.00),
      (2L, 5L, 9L, 7.00), (2L, 40L, 10L, 3.00))
    val in = MemoryStream[(Long, Long, Long, Double)]
    val out = StreamingLens.streamingEwma(
      in.toDF.toDF("user_id", "ts_us", "event_id", "value"),
      "user_id", "ts_us", "value", "event_id")
    val q = out.writeStream.format("memory").queryName("s_ewma")
      .outputMode("append").start()
    try {
      // split mid-log per key: the running s must survive the batch gap
      in.addData(log.take(2))
      q.processAllAvailable()
      in.addData(log.drop(2))
      q.processAllAvailable()
      val got = spark.sql("select event_id, ewma from s_ewma")
        .as[(Long, Long)].collect().toMap
      val batch = graft.operators.Anomaly.ewmaByKey(
          log.toDF("user_id", "ts_us", "event_id", "value"),
          "user_id", "ts_us", "value", num = 1, den = 4, idCol = "event_id")
        .select("event_id", "ewma").as[(Long, Long)].collect().toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join on a replayed log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Long, Long)]
    val buys = MemoryStream[(Long, Long)]
    val vdf = views.toDF.toDF("v_user", "v_sec")
      .withColumn("v_ts", timestamp_seconds(col("v_sec")))
    val bdf = buys.toDF.toDF("b_user", "b_sec")
      .withColumn("b_ts", timestamp_seconds(col("b_sec")))
    val out = StreamingLens.intervalJoin(vdf, bdf, "v_user", "b_user",
      "v_ts", "b_ts", delay = "10 seconds", horizon = "30 seconds")
    val q = out.writeStream.format("memory").queryName("s_ssjoin").start()
    // Seconds offset from a realistic base: a stateful op drops rows at or
    // below the CURRENT watermark (initially 0), so epoch-0-adjacent test
    // timestamps would be discarded as late before ever reaching the join.
    val B = 1600000000L
    val viewLog = Seq((1L, B + 0L), (1L, B + 100L), (2L, B + 45L))
    val buyLog = Seq((1L, B + 5L), (1L, B + 50L), (1L, B + 110L),
      (2L, B + 65L), (3L, B + 6L))
    try {
      // split the replay mid-log on BOTH sides: matches must survive the
      // micro-batch boundary through buffered join state
      views.addData(viewLog.take(2))
      buys.addData(buyLog.take(2))
      q.processAllAvailable()
      views.addData(viewLog.drop(2))
      buys.addData(buyLog.drop(2))
      q.processAllAvailable()
      val got = spark.sql("select v_user, v_sec, b_sec from s_ssjoin")
        .as[(Long, Long, Long)].collect().toSet
      // batch reference: same key + b in [v, v+30]
      val want = (for {
        (vu, v) <- viewLog; (bu, b) <- buyLog
        if vu == bu && b >= v && b <= v + 30
      } yield (vu, v, b)).toSet
      assert(got == want)
      assert(want == Set((1L, B + 0L, B + 5L), (1L, B + 100L, B + 110L),
        (2L, B + 45L, B + 65L)))
    } finally q.stop()
  }

  test("within-page line dedup binds free to a stream (builtin:dedup_lines)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:dedup_lines"}]}""")
    val out = StreamingLens.forward(pipe, in.toDF.toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("s_dedup_lines").start()
    try {
      in.addData((1L, "banner\nbody\nbanner"))
      q.processAllAvailable()
      // narrow per-row map: a later micro-batch dedups independently —
      // no state crosses batches, exactly the batch operator's semantics
      in.addData((2L, "x\nx\ny"))
      q.processAllAvailable()
      val rows = spark.sql(
        "select doc_id, n_kept, clean_text from s_dedup_lines")
        .as[(Long, Long, String)].collect().toSet
      assert(rows == Set((1L, 2L, "banner\nbody"), (2L, 2L, "x\ny")))
    } finally q.stop()
  }

  /** Ingest-gate fixture: texts engineered so every stage fires.
   *  clean() passes Gopher (13 words, mean len ~4.7, two distinct
   *  stopwords, zero symbols); blockText would pass Gopher but carries
   *  a blocklist phrase; shortText fails Gopher only. */
  object IngestFixture {
    def clean(tag: String): String =
      s"the quick brown foxes of yonder jumped over lazy sleeping dogs near $tag"
    val pats = Seq("slow join")
    val blockText =
      "the quick brown foxes of slow join jumped over lazy sleeping dogs today"
    val shortText = "too short indeed"
    val corpus: Seq[(Long, String)] = Seq((1L, clean("alpha")))
    // batch 1: 10 = corpus dup; 11 clean; 12/13 in-batch dup; 14 blocklisted
    val b1: Seq[(Long, String)] = Seq(
      (10L, clean("alpha")), (11L, clean("bravo")),
      (12L, clean("charlie")), (13L, clean("charlie")), (14L, blockText))
    // batch 2: 15 = cross-batch dup of 11; 16 Gopher-fail; 17 clean
    val b2: Seq[(Long, String)] = Seq(
      (15L, clean("bravo")), (16L, shortText), (17L, clean("delta")))
  }

  test("ingest gate: corpus/in-batch/cross-batch dups, blocklist hits and " +
      "Gopher failures all rejected; index carries admitted hashes only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import IngestFixture._
    val root = java.nio.file.Files.createTempDirectory("ingestgate").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    StreamingLens.ingestIndexOf(corpus.toDF("doc_id", "text"), "text")
      .write.parquet(idx)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingLens.ingestGate("text", "doc_id", pats, idx, out))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
        == Set(11L, 12L))
      in.addData(b2: _*); q.processAllAvailable()
      val kept = spark.read.parquet(out).select("doc_id").as[Long]
        .collect().toSet
      assert(kept == Set(11L, 12L, 17L), s"gate kept $kept")
      // admitted rows keep the full payload; the index is 8 B/doc
      assert(spark.read.parquet(out).columns.toSet == Set("doc_id", "text"))
      val indexed = spark.read.parquet(idx)
      assert(indexed.columns.toSeq == Seq("__h"))
      assert(indexed.count() == corpus.size + kept.size)
    } finally q.stop()
  }

  /** Crawl-gate fixture: three hosts — a.test has a graftbot group with
   *  a disallow + crawl delay, b.test rules everyone via '*' and
   *  advertises a sitemap, c.test has NO robots row (RFC default:
   *  fully allowed). URL 6 needs canonicalization (scheme/host case,
   *  default port, dot segments) before its host/path resolve. */
  object CrawlFixture {
    val agent = "GraftBot/1.0"
    val robots: Seq[(String, String)] = Seq(
      ("a.test", "User-agent: *\nDisallow: /\n\n" +
        "User-agent: graftbot\nDisallow: /private/\nCrawl-delay: 2\n"),
      ("b.test", "User-agent: *\nDisallow: /block\n" +
        "Sitemap: https://b.test/s.xml\n"))
    val b1: Seq[(Long, String)] = Seq(
      (1L, "https://a.test/pub/page"),
      (2L, "https://a.test/private/x"),
      (3L, "https://b.test/ok"))
    val b2: Seq[(Long, String)] = Seq(
      (4L, "https://b.test/block/z"),
      (5L, "https://c.test/whatever"),
      (6L, "HTTPS://A.TEST:443/pub/../pub/page2"))
  }

  test("crawl gate: robots-denied URLs drop, unlisted hosts pass, " +
      "canonicalization feeds the host probe, audit carries the delay") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import CrawlFixture._
    val root = java.nio.file.Files.createTempDirectory("crawlgate").toString
    val (rdir, out, audit) = (s"$root/robots", s"$root/out", s"$root/audit")
    robots.toDF("host", "robots").write.parquet(rdir)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("url_id", "url").writeStream
      .foreachBatch(StreamingLens.crawlGate("url", agent, rdir, out, audit))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(spark.read.parquet(out).select("url_id").as[Long].collect().toSet
        == Set(1L, 3L))
      in.addData(b2: _*); q.processAllAvailable()
      val kept = spark.read.parquet(out)
        .select("url_id", "canon_url").as[(Long, String)].collect().toMap
      assert(kept.keySet == Set(1L, 3L, 5L, 6L), s"gate kept $kept")
      assert(kept(6L) == "https://a.test/pub/page2") // canon before probe
      val aud = spark.read.parquet(audit)
        .select("host", "n_candidates", "n_admitted", "crawl_delay_ms")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(aud == Set(
        ("a.test", 2L, 1L, 2000L), ("b.test", 1L, 1L, -1L),   // batch 1
        ("a.test", 1L, 1L, 2000L), ("b.test", 1L, 0L, -1L),   // batch 2
        ("c.test", 1L, 1L, -1L)), s"audit $aud")
      // sitemap discovery rides the verdict columns
      val sm = spark.read.parquet(out).where(col("host") === "b.test")
        .select("n_sitemaps").as[Long].head()
      assert(sm == 1L)
    } finally q.stop()
  }

  test("crawl gate ≡ batch crawlDecide composition on the full dump") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import CrawlFixture._
    val root = java.nio.file.Files.createTempDirectory("crawlparity").toString
    val (rdir, out, audit) = (s"$root/robots", s"$root/out", s"$root/audit")
    robots.toDF("host", "robots").write.parquet(rdir)
    val batchKept = StreamingLens.crawlDecide(
        (b1 ++ b2).toDF("url_id", "url"), "url", agent,
        robots.toDF("host", "robots"))
      .where(col("allowed")).select("url_id").as[Long].collect().toSet
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("url_id", "url").writeStream
      .foreachBatch(StreamingLens.crawlGate("url", agent, rdir, out, audit))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val gateKept = spark.read.parquet(out).select("url_id").as[Long]
        .collect().toSet
      assert(gateKept == batchKept, s"gate $gateKept != batch $batchKept")
      assert(batchKept.nonEmpty && batchKept != (b1 ++ b2).map(_._1).toSet,
        "fixture drifted: batch composition rejected nothing")
    } finally q.stop()
  }

  test("frontier schedule closes the politeness loop over a replayed " +
      "split-log audit: latest-batch delay wins, never-fetched hosts " +
      "eligible immediately") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import CrawlFixture._
    val root = java.nio.file.Files.createTempDirectory("frontier").toString
    val (rdir, out, audit) = (s"$root/robots", s"$root/out", s"$root/audit")
    robots.toDF("host", "robots").write.parquet(rdir)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("url_id", "url").writeStream
      .foreachBatch(StreamingLens.crawlGate("url", agent, rdir, out, audit))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // fetch-completion log: a.test fetched twice, b.test once,
    // c.test (audited in batch 2) never fetched
    val fetches = Seq(("a.test", 10000L), ("a.test", 25000L),
      ("b.test", 12000L)).toDF("host", "fetch_ts_ms")
    val got = StreamingLens
      .frontierSchedule(spark.read.parquet(audit), fetches)
      .select("host", "crawl_delay_ms", "n_admitted_total", "n_batches",
        "last_fetch_ms", "next_eligible_ms")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // graftbot group on a.test: Crawl-delay 2 → 25000 + 2000
      ("a.test", 2000L, 2L, 2L, 25000L, 27000L),
      // b.test sets no delay (-1) → eligible right at last_fetch
      ("b.test", -1L, 1L, 2L, 12000L, 12000L),
      // no robots row AND never fetched → delay -1, eligible at 0
      ("c.test", -1L, 1L, 1L, -1L, 0L)), s"frontier $got")
  }

  test("frontier gate ENFORCES the ledger per batch: one fetch per host, " +
      "ineligible candidates defer, the fetch log records admissions — " +
      "and gate ≡ batch frontierAdmit on the replayed split log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("frontiergate").toString
    val (ldir, admit, defer, flog) =
      (s"$root/ledger", s"$root/admit", s"$root/defer", s"$root/flog")
    // ledger: a.test polite until 20000; b.test never fetched (0);
    // c.test ABSENT (no politeness debt)
    val ledger = Seq(("a.test", 20000L), ("b.test", 0L))
      .toDF("host", "next_eligible_ms")
    ledger.write.parquet(ldir)
    val b1: Seq[(Long, String, Long)] = Seq(
      (1L, "https://a.test/x", 15000L), // before a.test's window
      (2L, "https://a.test/y", 25000L), // eligible, earliest -> wins
      (3L, "https://a.test/z", 30000L), // eligible, loses the slot
      (4L, "https://b.test/k", 5000L),
      (5L, "https://c.test/w", 1000L))  // fresh host, admitted
    val b2: Seq[(Long, String, Long)] = Seq(
      (6L, "https://a.test/q", 40000L),
      (7L, "https://b.test/m", 6000L))
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF.toDF("url_id", "url", "ts_ms").writeStream
      .foreachBatch(StreamingLens.frontierGate("url", "ts_ms", ldir,
        admit, defer, flog))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.read.parquet(admit).select("url_id").as[Long]
      .collect().toSet
    assert(admitted == Set(2L, 4L, 5L, 6L, 7L), s"admitted $admitted")
    val deferred = spark.read.parquet(defer).select("url_id").as[Long]
      .collect().toSet
    assert(deferred == Set(1L, 3L), s"deferred $deferred")
    // the fetch log carries (host, admit ts) — frontierSchedule's input
    val log = spark.read.parquet(flog).as[(String, Long)].collect().toSet
    assert(log == Set(("a.test", 25000L), ("b.test", 5000L),
      ("c.test", 1000L), ("a.test", 40000L), ("b.test", 6000L)), s"log $log")
    // gate ≡ batch: frontierAdmit over each batch separately
    val batchAdmitted = Seq(b1, b2).flatMap { b =>
      StreamingLens.frontierAdmit(
          b.toDF("url_id", "url", "ts_ms"), "url", "ts_ms", ledger)
        .where(col("admitted")).select("url_id").as[Long].collect()
    }.toSet
    assert(batchAdmitted == admitted, s"batch $batchAdmitted != gate")
  }

  test("frontier waves: admissions advance the ledger wave-over-wave, " +
      "delayed hosts skip waves, ties break on url, leftovers defer") {
    import spark.implicits._
    // a.test: 50 s delay, last fetched at 10000 -> eligible from 60000;
    // b.test: no delay (-1), never fetched -> eligible immediately
    val audit = Seq(("a.test", 0L, 2L, 50000L), ("b.test", 0L, 3L, -1L))
      .toDF("host", "batch_id", "n_admitted", "crawl_delay_ms")
    val fetches = Seq(("a.test", 10000L)).toDF("host", "fetch_ts_ms")
    val candidates = Seq(
      (1L, "https://a.test/x", 0L),
      (2L, "https://a.test/y", 5000L),
      (3L, "https://b.test/p", 0L), // wave-0 tie with id 4 -> url wins
      (4L, "https://b.test/q", 0L),
      (5L, "https://b.test/r", 100000L))
      .toDF("url_id", "url", "ts_ms")
    val got = StreamingLens
      .frontierWaves(candidates, "url", "ts_ms", audit, fetches,
        waves = 3, waveMs = 30000L)
      .select("url_id", "host", "admitted_wave", "fetch_ts_ms")
      .as[(Long, String, Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // a.test opens at 60000: id 1's wave-2 offer (0 + 60000) just
      // reaches it and beats id 2; id 2 is still deferred after 3 waves
      (1L, "a.test", 2, 60000L),
      (2L, "a.test", -1, -1L),
      // b.test admits every wave: tie at wts 0 broken by url (/p < /q),
      // then id 4 at its wave-1 offer, then the late id 5
      (3L, "b.test", 0, 0L),
      (4L, "b.test", 1, 30000L),
      (5L, "b.test", 2, 160000L)), got.toSeq.toString)
  }

  test("ingest gate ≡ batch flagship composition on an id-ordered split log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import IngestFixture._
    import org.apache.spark.sql.graft.GraftScreen
    val dump = (b1 ++ b2).toDF("doc_id", "text")
    // the pipeline_ingest_gate batch composition over the FULL dump
    val fresh = graft.operators.Dedup.incrementalNew(
      dump, corpus.toDF("doc_id", "text"), "text", "doc_id")
    val screened = fresh.where(
      !GraftScreen.containsAnyPattern(col("text"), pats))
    val batchKept = graft.operators.TextAnalysis
      .gopherRules(screened, "text", "doc_id")
      .where(col("gopher_pass"))
      .select("doc_id").as[Long].collect().toSet
    val root = java.nio.file.Files.createTempDirectory("ingestparity").toString
    val (idx, out) = (s"$root/index", s"$root/out")
    StreamingLens.ingestIndexOf(corpus.toDF("doc_id", "text"), "text")
      .write.parquet(idx)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingLens.ingestGate("text", "doc_id", pats, idx, out))
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val gateKept = spark.read.parquet(out).select("doc_id").as[Long]
        .collect().toSet
      assert(gateKept == batchKept, s"gate $gateKept != batch $batchKept")
      assert(batchKept.nonEmpty && batchKept != (b1 ++ b2).map(_._1).toSet,
        "fixture drifted: batch composition rejected nothing")
    } finally q.stop()
  }

  test("revisit gate: ledger deltas fold to the batch accounting, " +
      "including a digest whose response and revisits arrive in " +
      "DIFFERENT batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val W = graft.operators.Warc
    val root = java.nio.file.Files.createTempDirectory("revgate").toString
    val ldir = s"$root/ledger"
    // docs 1-3: response + revisits in one archive each (the writer's
    // shape); doc 9: response archive in batch 1, a SEPARATE
    // revisit-only archive in batch 2 (the cross-batch merge case)
    def docArchive(id: Long, text: String, captures: Int): Array[Byte] = {
      val df = Seq((id, text, s"https://h${id % 2}.test/d/$id", captures))
        .toDF("doc_id", "text", "uri", "captures")
      W.withRevisitGzPayload(df, "text", "uri", "captures")
        .select("payload").as[Array[Byte]].head()
    }
    def revisitOnly(id: Long, text: String): Array[Byte] = {
      val dg = W.payloadDigest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      W.encodeWarcGz(Seq((Seq(
        "WARC-Type" -> "revisit",
        "WARC-Target-URI" -> s"https://h${id % 2}.test/d/$id",
        "WARC-Date" -> "2026-02-01T00:00:00Z",
        "WARC-Profile" ->
          "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
        "WARC-Payload-Digest" -> dg,
        "WARC-Refers-To-Target-URI" -> s"https://h${id % 2}.test/d/$id"),
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
    val batch1 = Seq(
      (1L, docArchive(1L, "alpha body one", 2)),
      (2L, docArchive(2L, "beta", 1)),
      (9L, docArchive(9L, "gamma gamma", 1))).toDF("doc_id", "payload")
    val batch2 = Seq(
      (3L, docArchive(3L, "delta text", 3)),
      (9L, revisitOnly(9L, "gamma gamma")),
      (10L, revisitOnly(9L, "gamma gamma"))).toDF("doc_id", "payload")
    val gate = StreamingLens.revisitGate("payload", ldir)
    gate(batch1, 0L)
    gate(batch2, 1L)
    val got = StreamingLens.revisitAccounting(spark, ldir)
      .orderBy("host")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // batch-face reference: the flagship aggregation over the UNION
    val all = batch1.union(batch2)
    val walk = W.revisitRecords(all, "payload").select(
      regexp_extract(col("target_uri"), "https://([^/]+)/", 1).as("host"),
      col("warc_type"), col("payload_digest"), col("body_len"))
    val want = walk.groupBy(col("host"), col("payload_digest"))
      .agg(
        sum(when(col("warc_type") === "response", 1L).otherwise(0L))
          .as("n_resp"),
        sum(when(col("warc_type") === "revisit", 1L).otherwise(0L))
          .as("n_rev"),
        max(when(col("warc_type") === "response", col("body_len")))
          .as("len"))
      .groupBy(col("host")).agg(
        sum(col("n_resp") + col("n_rev")).as("n_fetches"),
        sum(col("n_rev")).as("n_revisits"),
        sum(col("n_resp") * col("len")).as("stored_bytes"),
        sum(col("n_rev") * col("len")).as("saved_bytes"))
      .withColumn("saved_ppm",
        expr("saved_bytes * 1000000L div (stored_bytes + saved_bytes)"))
      .orderBy("host")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"gate fold != batch accounting: $got vs $want")
    // the cross-batch digest really merged: doc 9 contributes
    // 1 response + 2 revisits and its saved bytes use the batch-1 len
    val h1 = got.find(_._1 == "h1.test").get
    assert(h1._3 >= 2L, s"cross-batch revisits lost: $h1")
  }
}

