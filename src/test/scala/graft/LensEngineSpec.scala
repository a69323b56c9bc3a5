package graft

import graft.engine.{LensEngine, Pipeline}
import graft.model.PipelineConfig
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases mirroring the reference's CLI/engine integration tests
 *  (FIXTURES.md §1; reference: tests/integration/cli). */
class LensEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // F1 input (reference: host-go/engine/tests/utils.go:12-20)
  private def people = Seq(("John", 3L), ("Fred", 5L), ("Orpheus", 7L))
    .toDF("Name", "Age")

  test("F1 simple rename map (T1)") {
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
      .forward(people)
    assert(out.columns.toSeq == Seq("FullName", "Age"))
    assert(out.as[(String, Long)].collect().toSeq ==
      Seq(("John", 3L), ("Fred", 5L), ("Orpheus", 7L)))
  }

  test("F2 arithmetic map with inverse (T2): forward +1, inverse -1, lens-file inverse flag") {
    val json =
      """{"lenses":[{"path":"builtin:with_column","arguments":
        |{"col":"Age","expr":"Age + 1","inverse_expr":"Age - 1"}}]}""".stripMargin
    val fwd = Pipeline.fromJson(json)
    assert(fwd.forward(people).select("Age").as[Long].collect().toSeq == Seq(4L, 6L, 8L))
    // stage-level inverse flag (reference: config/config.go:84-100)
    val flipped = Pipeline.fromJson(json.replace("\"arguments\"",
      "\"inverse\":true,\"arguments\""))
    assert(flipped.forward(people).select("Age").as[Long].collect().toSeq == Seq(2L, 4L, 6L))
    // pipeline-level inverse: forward then inverse = identity (P11)
    val round = fwd.inverseTransform(fwd.forward(people))
    assert(round.as[(String, Long)].collect().toSeq == people.as[(String, Long)].collect().toSeq)
  }

  test("F3 parameterized rename error on missing source property (T4)") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.fromJson(
        """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Nope","dst":"X"}}]}""")
        .forward(people).collect()
    }
    assert(e.getMessage.contains("The requested property was not found"))
  }

  test("F4 filter keeps only __type == pass (T5)") {
    val in = Seq(("John", "pass"), ("Fred", "skip"), ("Orpheus", "pass"))
      .toDF("Name", "__type")
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:filter","arguments":{"expr":"__type = 'pass'"}}]}""")
      .forward(in)
    assert(out.as[(String, String)].collect().toSeq ==
      Seq(("John", "pass"), ("Orpheus", "pass")))
  }

  test("F5 normalize/explode Book -> Page (T6)") {
    val books = Seq(("Alice", Seq(1, 2)), ("Bob", Seq(3)))
      .toDF("BookName", "PageNumbers")
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:explode","arguments":{"col":"PageNumbers","as":"Number"}}]}""")
      .forward(books)
    assert(out.as[(String, Int)].collect().toSeq ==
      Seq(("Alice", 1), ("Alice", 2), ("Bob", 3)))
  }

  test("F6 counter assigns global 1-based sequence (T7)") {
    val out = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:counter","arguments":{"as":"Id","order_by":"Name"}}]}""")
      .forward(people)
    assert(out.select("Id", "Name").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "Fred"), (2L, "John"), (3L, "Orpheus")))
  }

  test("F8/P10 unknown lens id is identity; malformed id errors") {
    val engine = LensEngine()
    val out = engine.transform(people, "sha256:" + "ab" * 32)
    assert(out.as[(String, Long)].collect().toSeq == people.as[(String, Long)].collect().toSeq)
    intercept[IllegalArgumentException] {
      engine.transform(people, "fjndshjbavgc")
    }
  }

  test("F9 empty pipeline is identity; multi-stage composes in order") {
    val empty = Pipeline.fromJson("""{"lenses":[]}""")
    assert(empty.forward(people).collect().toSeq == people.collect().toSeq)

    val multi = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}},
        |  {"path":"builtin:with_column","arguments":{"col":"Age","expr":"Age + 1"}}
        |]}""".stripMargin)
    val out = multi.forward(people)
    assert(out.columns.toSeq == Seq("FullName", "Age"))
    assert(out.as[(String, Long)].collect().toSeq ==
      Seq(("John", 4L), ("Fred", 6L), ("Orpheus", 8L)))
  }

  test("content id is deterministic, key-order independent, and dedupes (L1)") {
    val a = PipelineConfig.fromJson(
      """{"lenses":[{"path":"p","arguments":{"b":1,"a":"x"}}]}""")
    val b = PipelineConfig.fromJson(
      """{"lenses":[{"path":"p","arguments":{"a":"x","b":1}}]}""")
    assert(a.contentId == b.contentId)
    assert(a.contentId.matches("sha256:[0-9a-f]{64}"))

    val engine = LensEngine()
    val id1 = engine.add("""{"lenses":[{"path":"builtin:identity"}]}""")
    val id2 = engine.add("""{"lenses":[{"path":"builtin:identity"}]}""")
    assert(id1 == id2)
    assert(engine.list.map(_._1) == Seq(id1))
  }

  test("inverse of a non-invertible stage fails like a missing inverse export") {
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:filter","arguments":{"expr":"Age > 3"}}]}""")
    val e = intercept[UnsupportedOperationException](pipe.inverse)
    assert(e.getMessage.contains("does not export an inverse"))
  }

  test("P7 escape hatch: custom stateful mapPartitions LensOp composes in a pipeline") {
    // The reference shares one WASM instance across stages for cross-stage
    // state (order-sensitive by construction). The documented Spark
    // analogue: a programmatic LensOp carrying partition-local state via
    // mapPartitions — explicit, composable with builtin stages.
    import spark.implicits._
    import graft.ops.LensOp
    val runningMax = LensOp("running_max_per_partition", { df =>
      val enc = org.apache.spark.sql.Encoders.row(
        org.apache.spark.sql.types.StructType(df.schema.fields :+
          org.apache.spark.sql.types.StructField("run_max",
            org.apache.spark.sql.types.LongType)))
      df.mapPartitions { rows =>
        var mx = Long.MinValue // partition-local state, explicit
        rows.map { r =>
          mx = math.max(mx, r.getAs[Long]("v"))
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ mx)
        }
      }(enc)
    })
    val pipe = Pipeline(Seq(
      graft.ops.BuiltinOps.resolve("builtin:filter",
        graft.ops.Args(Map("expr" -> "\"v > 0\""))),
      runningMax))
    val out = pipe.forward(
      Seq(1L, -5L, 3L, 2L).toDF("v").repartition(1))
    val got = out.select("v", "run_max").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 3L, 2L))
    // run_max is non-decreasing within the partition
    assert(got.map(_._2) == got.map(_._2).scanLeft(Long.MinValue)(math.max).tail)
  }

  test("registry persist + reload round-trip (L3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-registry")
    val e1 = LensEngine(dir.toString)
    val id = e1.add(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"a","dst":"b"}}]}""")
    // a fresh engine over the same dir re-hydrates the persisted lens
    val e2 = LensEngine(dir.toString)
    assert(e2.list.isEmpty)
    assert(e2.reload() == 1)
    assert(e2.list.map(_._1) == Seq(id))
    import spark.implicits._
    val out = e2.transform(Seq((1, "x")).toDF("a", "v"), id)
    assert(out.columns.contains("b"))
  }

  test("driver entry() smoke: flagship query returns rows at sf0.001") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("sessionize and sample_group resolve as lens-file stages") {
    import spark.implicits._
    val events = Seq((1L, 0L, 10L), (1L, 50L, 11L), (1L, 500L, 12L), (2L, 5L, 13L))
      .toDF("uid", "t", "eid")
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:sessionize",
        |  "arguments":{"key":"uid","ts":"t","gap":"100","tie":"eid"}}]}""".stripMargin)
    val out = pipe.forward(events)
      .select("eid", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 1L))

    val samplePipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:sample_group",
        |  "arguments":{"group":"uid","id":"eid","k":1}}]}""".stripMargin)
    val sampled = samplePipe.forward(events)
    assert(sampled.count() == 2) // one per uid
    assert(sampled.columns.toSeq == events.columns.toSeq)
  }

  test("large-scale operators run as lens-file stages (dedup_exact)") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:dedup_exact",
        |  "arguments":{"text":"text","id":"doc_id"}}]}""".stripMargin)
    val out = pipe.forward(df).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  /** The reference's shared-state counter module: increments instance
   *  state on every transform call and writes it to Id (reference:
   *  host-go/engine/tests/wasm32_pipeline_with_state_test.go:16-100). */
  private def counterGuest = new graft.ops.RowGuest {
    override def outputSchema(in: org.apache.spark.sql.types.StructType) = in
    override def open(in: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.Row => org.apache.spark.sql.Row = {
      val idx = in.fieldIndex("Id")
      var n = 0L
      r => { n += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(idx, n)) }
    }
  }

  test("P5/P7 opaque guest: same instance appended 3x shares state (ids 3,6,9)") {
    graft.ops.GuestRegistry.register("counter", counterGuest)
    val stage =
      """{"path":"builtin:opaque","arguments":
        |  {"guest":"counter","instance":"i1","serial":true}}""".stripMargin
    val pipe = Pipeline.fromJson(s"""{"lenses":[$stage,$stage,$stage]}""")
    // fused to ONE mapPartitions over one shared instance
    assert(pipe.stages.length == 1)
    assert(pipe.stages.head.name == "opaque(counter x3)")
    val in = Seq((0L, "John"), (0L, "Shahzad"), (0L, "Addo")).toDF("Id", "Name")
    val out = pipe.forward(in).as[(Long, String)].collect().toSeq
    // item i flows through all 3 stages before item i+1 (reference pull loop)
    assert(out == Seq((3L, "John"), (6L, "Shahzad"), (9L, "Addo")))
  }

  test("P5 opaque guest: distinct instances do NOT fuse or share state") {
    graft.ops.GuestRegistry.register("counter", counterGuest)
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:opaque","arguments":{"guest":"counter","instance":"a","serial":true}},
        |  {"path":"builtin:opaque","arguments":{"guest":"counter","instance":"b","serial":true}}
        |]}""".stripMargin)
    assert(pipe.stages.length == 2)
    val in = Seq((0L, "John"), (0L, "Shahzad")).toDF("Id", "Name")
    // each stage recounts from its own fresh state: final ids 1, 2
    val out = pipe.forward(in).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "John"), (2L, "Shahzad")))
  }

  test("registry: a stored pipeline references another by content id") {
    val engine = LensEngine()
    val idA = engine.add(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
    val idB = engine.add(
      s"""{"lenses":[
         |  {"path":"$idA"},
         |  {"path":"builtin:with_column","arguments":{"col":"Age","expr":"Age + 1"}}
         |]}""".stripMargin)
    val out = engine.transform(people, idB)
    assert(out.columns.toSeq == Seq("FullName", "Age"))
    assert(out.as[(String, Long)].collect().toSeq ==
      Seq(("John", 4L), ("Fred", 6L), ("Orpheus", 8L)))
    // referencing an id that is not stored fails at add (fetch semantics)
    intercept[IllegalArgumentException] {
      engine.add(s"""{"lenses":[{"path":"sha256:${"cd" * 32}"}]}""")
    }
  }

  test("L6 transactions: all-or-nothing publish, staged ids visible in-txn") {
    val engine = LensEngine()
    // commit path: B references A staged in the SAME txn
    val (idA, idB) = engine.withTxn { txn =>
      val a = txn.add(
        """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
      val b = txn.add(
        s"""{"lenses":[{"path":"$a"},
           |  {"path":"builtin:with_column","arguments":{"col":"Age","expr":"Age + 1"}}]}""".stripMargin)
      (a, b)
    }
    assert(engine.list.map(_._1).toSet == Set(idA, idB))
    assert(engine.transform(people, idB).columns.contains("FullName"))

    // error path: a later invalid add discards the whole txn
    val before = engine.list.map(_._1).toSet
    intercept[IllegalArgumentException] {
      engine.withTxn { txn =>
        txn.add("""{"lenses":[{"path":"builtin:filter","arguments":{"expr":"Age > 1"}}]}""")
        txn.add("""{"lenses":[{"path":"builtin:no_such_op"}]}""")
      }
    }
    assert(engine.list.map(_._1).toSet == before) // nothing published
  }

  test("reload rehydrates cross-referencing pipelines regardless of file order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reload-refs")
    val e1 = LensEngine(dir.toString)
    val idA = e1.add(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
    val idB = e1.add(s"""{"lenses":[{"path":"$idA"}]}""")
    // fresh engine: directory order is arbitrary (hash-named files); the
    // fixpoint loop must admit B whenever A loads, in any order
    val e2 = LensEngine(dir.toString)
    assert(e2.reload() == 2)
    assert(e2.list.map(_._1).toSet == Set(idA, idB))
    assert(e2.transform(people, idB).columns.contains("FullName"))
    // a genuinely dangling reference surfaces instead of looping
    java.nio.file.Files.writeString(dir.resolve("sha256_dangling.json"),
      s"""{"lenses":[{"path":"sha256:${"ef" * 32}"}]}""")
    intercept[IllegalArgumentException] { LensEngine(dir.toString).reload() }
  }

  test("file: lens references inline the referenced pipeline; cycles error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lensref")
    val inner = dir.resolve("inner.json")
    java.nio.file.Files.writeString(inner,
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
    val out = Pipeline.fromJson(
      s"""{"lenses":[{"path":"file:$inner"}]}""").forward(people)
    assert(out.columns.toSeq == Seq("FullName", "Age"))

    val a = dir.resolve("a.json"); val b = dir.resolve("b.json")
    java.nio.file.Files.writeString(a, s"""{"lenses":[{"path":"file:$b"}]}""")
    java.nio.file.Files.writeString(b, s"""{"lenses":[{"path":"file:$a"}]}""")
    val e = intercept[IllegalArgumentException] {
      Pipeline.fromJson(s"""{"lenses":[{"path":"file:$a"}]}""")
    }
    assert(e.getMessage.contains("cyclic lens reference"))
  }

  test("pipeline-prep lens ops: chunk, mixture, pack, vocab, tfidf resolve as stages") {
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h i j"),
      (2L, "srcA", "a a a b b c x y z w"),
      (3L, "srcB", "k l m n o p q r s t"))
      .toDF("doc_id", "source", "text")

    val chunked = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:chunk","arguments":{"window":4,"stride":4}}]}""")
      .forward(docs)
    assert(chunked.count() == 9) // 3 docs x 10 tokens / stride 4 -> 3 chunks each

    val mixed = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:mixture","arguments":
        |{"group":"source","rates":{"srcA":0.0},"default":1.0}}]}""".stripMargin)
      .forward(docs)
    assert(mixed.select("doc_id").as[Long].collect().toSeq == Seq(3L))

    val packed = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:pack","arguments":{"group":"source","budget":15}}]}""")
      .forward(docs)
    assert(packed.select("doc_id", "pack_id").as[(Long, Long)].collect().toMap ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L)) // doc 2 starts at token 10 < 15

    val vocab = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:vocab","arguments":{"k":1}}]}""")
      .forward(docs)
    assert(vocab.as[(String, Long)].collect().toSeq == Seq(("a", 4L)))

    val terms = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:tfidf","arguments":{"k":1}}]}""")
      .forward(docs).select("doc_id", "token").as[(Long, String)].collect().toMap
    assert(terms.keySet == Set(1L, 2L, 3L))

    val redacted = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:redact_pii","arguments":{}}]}""")
      .forward(Seq((9L, "mail me a@b.co now")).toDF("doc_id", "text"))
      .select("doc_id", "n_emails", "text_redacted")
      .as[(Long, Long, String)].collect().toSeq
    assert(redacted == Seq((9L, 1L, "mail me [EMAIL] now")))

    val cards = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:redact_cards","arguments":{}}]}""")
      .forward(Seq((9L, "pan 4111 1111 1111 1111 ok")).toDF("doc_id", "text"))
      .select("doc_id", "n_cards_valid", "text_redacted")
      .as[(Long, Long, String)].collect().toSeq
    assert(cards == Seq((9L, 1L, "pan [CARD] ok")))

    val tableRows = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:html_tables","arguments":{}}]}""")
      .forward(Seq((3L, "<table><tr><td>a</td><td>b</td></tr></table>"))
        .toDF("doc_id", "html"))
      .select("doc_id", "row_idx", "n_cells")
      .as[(Long, Int, Long)].collect().toSeq
    assert(tableRows == Seq((3L, 0, 2L)))

    val robot = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:robots_decide","arguments":{}}]}""")
      .forward(Seq((4L, "User-agent: *\nDisallow: /no\n", "bot", "/no/x"))
        .toDF("doc_id", "robots", "agent", "path"))
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toSeq
    assert(robot == Seq((4L, false)))

    val smEntries = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:sitemap_entries","arguments":{}}]}""")
      .forward(Seq((5L, "<urlset><url><loc>u</loc></url></urlset>"))
        .toDF("doc_id", "xml"))
      .select("doc_id", "loc").as[(Long, String)].collect().toSeq
    assert(smEntries == Seq((5L, "u")))

    val warcRows = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:warc_records","arguments":{}}]}""")
      .forward(Seq((6L, graft.operators.Warc.encodeWarcGz(Seq(
        (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "u6"),
          graft.operators.Warc.httpResponse("<p>w</p>".getBytes("UTF-8")))))))
        .toDF("doc_id", "payload"))
      .select("doc_id", "warc_type", "http_status")
      .as[(Long, String, Int)].collect().toSeq
    assert(warcRows == Seq((6L, "response", 200)))

    val segDedup = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:segment_dedup","arguments":
        |{"seg_tokens":5,"max_doc_freq":1}}]}""".stripMargin)
      .forward(docs)
    assert(segDedup.count() == 3) // all 5-token segments here are unique

    val buckets = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:quantile_buckets","arguments":
        |{"score":"text","k":3}}]}""".stripMargin)
      .forward(docs).select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    // (text, id) order: doc 2 ("a a a…") < doc 1 ("a b c…") < doc 3 ("k l…")
    assert(buckets == Map(2L -> 1L, 1L -> 2L, 3L -> 3L))

    val lm = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:unigram_lm","arguments":{}}]}""")
      .forward(Seq((1L, "x y"), (2L, "x x")).toDF("doc_id", "text"))
      .select("doc_id", "sum_freq").as[(Long, Long)].collect().toMap
    assert(lm == Map(1L -> 4L, 2L -> 6L)) // x:3, y:1

    val km = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:kmeans","arguments":{"k":2,"iters":2}}]}""")
      .forward(Seq(
        (1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)),
        (3L, Array(9f, 9f)), (4L, Array(9.1f, 9f)))
        .toDF("vec_id", "embedding"))
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(km(1L) == km(2L) && km(3L) == km(4L) && km(1L) != km(3L))
  }

  test("data: lens references: base64 and percent-encoded, as stage and engine add") {
    val lensJson =
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(lensJson.getBytes("UTF-8"))

    // As a stage path: the reference's fetch-by-URL inlined as a sub-pipeline.
    val out = Pipeline.fromJson(
      s"""{"lenses":[{"path":"data:application/json;base64,$b64"}]}""").forward(people)
    assert(out.columns.toSeq == Seq("FullName", "Age"))

    // Percent-encoded (no ;base64 marker) resolves identically.
    val enc = java.net.URLEncoder.encode(lensJson, "UTF-8")
    val out2 = Pipeline.fromJson(
      s"""{"lenses":[{"path":"data:application/json,$enc"}]}""").forward(people)
    assert(out2.columns.toSeq == Seq("FullName", "Age"))

    // Engine-level: addRef ingests the data: URL, id matches the inline
    // add, and the stored pipeline resolves by sha256: id afterwards.
    val engine = LensEngine()
    val id = engine.addRef(s"data:application/json;base64,$b64")
    assert(id == engine.add(lensJson)) // content id is transport-independent
    assert(engine.transform(people, id).columns.toSeq == Seq("FullName", "Age"))
  }

  test("http: lens references fetch through the scheme dispatcher") {
    val lensJson =
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}"""
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/lens.json", (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = lensJson.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      server.start()
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/lens.json"
      // Stage-path fetch and engine-level addRef, same as file:/data:.
      val out = Pipeline.fromJson(s"""{"lenses":[{"path":"$url"}]}""").forward(people)
      assert(out.columns.toSeq == Seq("FullName", "Age"))
      val engine = LensEngine()
      val id = engine.addRef(url)
      assert(engine.transform(people, id).columns.toSeq == Seq("FullName", "Age"))
      // 404 surfaces as a fetch error, not a silent identity.
      val e = intercept[IllegalArgumentException] {
        engine.addRef(s"http://127.0.0.1:${server.getAddress.getPort}/missing.json")
      }
      assert(e.getMessage.contains("HTTP 404"))
    } finally server.stop(0)
  }

  test("L5 syncLens: pulls a missing lens from a peer, durable + idempotent") {
    val peer = LensEngine()
    val id = peer.add(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
    val dir = java.nio.file.Files.createTempDirectory("graft-sync")
    val local = LensEngine(dir.toString)
    assert(local.transform(people, id).columns.toSeq == Seq("Name", "Age"),
      "unknown id must be identity before sync")
    local.syncLens(id, Seq(peer))
    assert(local.transform(people, id).columns.toSeq == Seq("FullName", "Age"))
    // durable: a fresh engine over the same dir reloads the synced lens
    val rehydrated = LensEngine(dir.toString)
    assert(rehydrated.reload() == 1)
    assert(rehydrated.transform(people, id).columns.toSeq == Seq("FullName", "Age"))
    // idempotent: re-sync with NO peers succeeds because it's local now
    local.syncLens(id, Seq.empty)
  }

  test("L5 syncLens: transitive sha256 references pull linked lenses first") {
    val peer = LensEngine()
    val idA = peer.add(
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}""")
    val idB = peer.add(
      s"""{"lenses":[
         |  {"path":"$idA"},
         |  {"path":"builtin:with_column","arguments":{"col":"Age","expr":"Age + 1"}}
         |]}""".stripMargin)
    val local = LensEngine()
    local.syncLens(idB, Seq(peer))
    val out = local.transform(people, idB)
    assert(out.columns.toSeq == Seq("FullName", "Age"))
    assert(out.where("FullName = 'John'").select("Age")
      .as[Long].collect().toSeq == Seq(4L))
    // the linked block arrived too, as its own addressable entry
    assert(local.list.map(_._1).toSet == Set(idA, idB))
  }

  test("L5 syncLens: times out when no peer holds the id") {
    val local = LensEngine()
    val absent = "sha256:" + "0" * 64
    val t0 = System.nanoTime()
    intercept[java.util.concurrent.TimeoutException] {
      local.syncLens(absent, Seq(LensEngine()), timeoutMs = 150)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 150, "must keep retrying until the deadline")
    intercept[IllegalArgumentException] {
      local.syncLens("not-a-cid", Seq.empty)
    }
  }

  // ---- CIDv1/IPLD content ids (reference: host-go/store/block.go,
  // store.go:275-282) ----------------------------------------------------

  test("CID golden fixture: block bytes and CIDs match the reference's " +
      "dag-cbor layout (independently derived)") {
    import graft.engine.Cid
    import graft.model.StageConfig
    import scala.collection.immutable.SortedMap
    // Expected bytes/CIDs hand-derived from the reference block layout
    // (CIDv1, dag-cbor 0x71, sha2-256; bindnode field order; tag-42
    // identity-prefixed links) with an independent Python CBOR encoder —
    // NOT computed by the code under test.
    val cfg = PipelineConfig(Seq(
      StageConfig("p", inverse = false, SortedMap("delta" -> "5"))))
    val (cid, blocks) = Cid.configBlocks(cfg, _ => Array[Byte](1, 2, 3, 4))
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val byCid = blocks.toMap
    assert(cid == "bafyreihhpyydr3wbzx2uqyetpyngmzx2a7xjmj5qw5azx5od6ar4skjofu")
    assert(blocks.map(_._1) == Vector(
      "bafyreidzajkv6mh4gbvqn33gdq3sua2hdafo3cic7s4vewyylxlsttdihy", // lens
      "bafyreicvmhus6j562vtrolldheqq2cryq7vdnyl6sbomhjaimmfzpaxnte", // module
      cid)) // config — leaves stored before parents, the reference order
    assert(hex(byCid("bafyreidzajkv6mh4gbvqn33gdq3sua2hdafo3cic7s4vewyylxlsttdihy"))
      == "a1697761736d42797465734401020304")
    assert(hex(byCid("bafyreicvmhus6j562vtrolldheqq2cryq7vdnyl6sbomhjaimmfzpaxnte"))
      == "a367696e7665727365f469617267756d656e747381a2636b65796564656c746165" +
         "76616c75656135646c656e73d82a582500017112207902555f30fc306b06ef661c" +
         "372a0347180aed8902fcb9525b185dd729cc683e")
    assert(hex(byCid(cid))
      == "a1676d6f64756c657381d82a582500017112205561e92f27bed567172d6339210d" +
         "0a3887ea36e17e905cc3a408630b9782ed99")
  }

  test("CID chunking: payloads above maxBlockSize split into leaf blocks " +
      "under a chunks root (reference: block.go:135-172)") {
    import graft.engine.Cid
    val (rootLink, blocks) =
      Cid.lensBlocks(Array[Byte](1, 2, 3, 4, 5, 6, 7), maxBlockSize = 3)
    assert(blocks.length == 4) // 3 leaves + chunks root
    assert(Cid.cidString(rootLink) ==
      "bafyreie4k7apadn4pufa2z7zhmkjy5kned6a3uqoslaj3cmvojtdevrfs4")
    assert(blocks.head._1 ==
      "bafyreiausz7filbjpwkzoemfto5z4m5q2djkqj4f4cf3rszcglyagsvjze")
    // single-chunk payloads inline the bytes — no chunks indirection
    val (_, single) = Cid.lensBlocks(Array[Byte](1, 2, 3), maxBlockSize = 3)
    assert(single.length == 1)
  }

  test("CID round-trips through the engine: add + listCids + transform/" +
      "inverse by CID address the same pipeline") {
    import graft.wasm.LensGuestModules
    val url = "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(LensGuestModules.shiftGuest("Age"))
    val engine = LensEngine()
    val id = engine.add(
      s"""{"lenses":[{"path":"$url","arguments":{"delta":4}}]}""")
    val cid = engine.cidOf(id).getOrElse(fail("no CID computed for a wasm config"))
    assert(cid.startsWith("bafyrei"), s"not a CIDv1(dag-cbor, sha2-256): $cid")
    // list by CID — the reference's list shape (store.go:157-192)
    assert(engine.listCids.map(_._1) == Seq(cid))
    assert(engine.listCids.head._2 == engine.list.head._2)
    // transform and inverse by CID ≡ by sha256 id
    val byId = engine.transform(people, id).as[(String, Long)].collect().toSet
    val byCid = engine.transform(people, cid).as[(String, Long)].collect().toSet
    assert(byCid == byId && byCid == Set(("John", 7L), ("Fred", 9L), ("Orpheus", 11L)))
    assert(engine.inverse(people, cid).as[(String, Long)].collect().toSet ==
      Set(("John", -1L), ("Fred", 1L), ("Orpheus", 3L)))
    // determinism: same config in a fresh engine -> same CID (content id)
    val engine2 = LensEngine()
    val id2 = engine2.add(
      s"""{"lenses":[{"path":"$url","arguments":{"delta":4}}]}""")
    assert(engine2.cidOf(id2).contains(cid))
    // unknown-but-WELL-FORMED CID -> identity pass-through, like sha256
    // ids (the golden fixture CID is a valid CIDv1 not in this engine)
    val ghost = "bafyreihhpyydr3wbzx2uqyetpyngmzx2a7xjmj5qw5azx5od6ar4skjofu"
    assert(engine.transform(people, ghost).as[(String, Long)].collect().toSet ==
      people.as[(String, Long)].collect().toSet)
    // malformed CID-ish strings ERROR (reference CID-parse semantics):
    // right length but wrong multicodec header, wrong length, bad chars
    for (bad <- Seq("b" + "a" * 58, "bananabanana", cid.dropRight(1),
        cid.init + "A")) {
      intercept[IllegalArgumentException] { engine.transform(people, bad) }
    }
  }

  test("resolve() CID acceptance matrix: graft-profile ids resolve in any " +
      "multibase; well-formed foreign CIDs (CIDv0, other codecs) are " +
      "identity; only unparseable ids error") {
    import graft.engine.Cid
    import graft.wasm.LensGuestModules
    val url = "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(LensGuestModules.shiftGuest("Age"))
    val engine = LensEngine()
    val id = engine.add(
      s"""{"lenses":[{"path":"$url","arguments":{"delta":4}}]}""")
    val cid = engine.cidOf(id).getOrElse(fail("no CID"))
    val raw = Cid.parseAnyCid(cid).getOrElse(fail("minted CID must parse"))
    assert(Cid.isGraftProfile(raw))
    val expect = Set(("John", 7L), ("Fred", 9L), ("Orpheus", 11L))

    // the SAME minted CID spelled in foreign multibases resolves
    val base16 = "f" + raw.map(b => f"${b & 0xFF}%02x").mkString
    val base36 = "k" + new java.math.BigInteger(1, raw).toString(36)
    val b58alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    val base58 = {
      var n = new java.math.BigInteger(1, raw)
      val sb = new StringBuilder
      val fe = java.math.BigInteger.valueOf(58L)
      while (n.signum() > 0) {
        val Array(q, r) = n.divideAndRemainder(fe); sb += b58alpha(r.intValue); n = q
      }
      "z" + sb.result().reverse
    }
    for (alias <- Seq(base16, base36, base58)) {
      assert(Cid.parseAnyCid(alias).exists(_.sameElements(raw)),
        s"re-encoding $alias must parse back to the same bytes")
      assert(engine.transform(people, alias).as[(String, Long)].collect().toSet
        == expect, s"graft-profile CID must resolve via $alias")
    }

    // well-formed FOREIGN CIDs -> identity pass-through (reference:
    // host-go/repository/repository.go:244-254 no-migration path)
    val before = people.as[(String, Long)].collect().toSet
    val cidV0 = "QmYwAPJzv5CZsnA625s3Xf2nemtYgPpHdWEz79ojWnPbdG"
    assert(Cid.parseAnyCid(cidV0).exists(b => b.length == 34 && b(0) == 0x12))
    // CIDv1 raw-codec (0x55) over the same digest: parseable, not graft's
    val foreign = Cid.cidString(
      Array[Byte](0x01, 0x55, 0x12, 0x20) ++ raw.drop(4))
    assert(Cid.parseAnyCid(foreign).isDefined &&
      !Cid.isGraftProfile(Cid.parseAnyCid(foreign).get))
    for (f <- Seq(cidV0, foreign)) {
      assert(engine.transform(people, f).as[(String, Long)].collect().toSet
        == before, s"foreign well-formed CID $f must be identity")
    }

    // unparseable still errors: bad multibase prefix, truncated CIDv0,
    // base36 garbage that decodes but fails the varint layout
    for (bad <- Seq("x" + cid.tail, cidV0.dropRight(1), "k0", "kzzzz")) {
      intercept[IllegalArgumentException] { engine.transform(people, bad) }
    }
  }
}
