package graft

import graft.operators.Warc
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** WARC container walk: gzip-member round-trip, header/framing fidelity,
 *  HTTP response split, and the named-failure contract. */
class WarcSpec extends AnyFunSuite {

  private def crawlTriple(uri: String, html: String) = Seq(
    (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> "2026-01-01T00:00:00Z"),
      "software: graft\r\n".getBytes(UTF_8)),
    (Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri),
      s"GET $uri HTTP/1.1\r\n\r\n".getBytes(UTF_8)),
    (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri),
      Warc.httpResponse(html.getBytes(UTF_8))))

  test("warc.gz round-trip: one gzip member per record, headers and " +
      "payload blocks byte-exact, HTTP response split recovers the body") {
    val html = "<html><body><p>hello &amp; goodbye</p></body></html>"
    val gz = Warc.encodeWarcGz(crawlTriple("https://x.test/a", html))
    assert(Warc.isWarcGz(gz) && Warc.isWarc(gz))
    // Common Crawl layout: each record is its own gzip member
    val members = (0 until gz.length - 2).count(i =>
      (gz(i) & 0xFF) == 0x1F && (gz(i + 1) & 0xFF) == 0x8B && (gz(i + 2) & 0xFF) == 0x08)
    assert(members == 3, s"expected 3 gzip members, found $members")
    val recs = Warc.parseWarc(gz)
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response"))
    assert(recs(1).targetUri == "https://x.test/a")
    assert(recs(0).header("WARC-Date").contains("2026-01-01T00:00:00Z"))
    assert(new String(recs(0).payload, UTF_8) == "software: graft\r\n")
    val http = Warc.parseHttp(recs(2).payload)
    assert(http.status == 200)
    assert(http.contentType == "text/html; charset=UTF-8")
    assert(new String(http.body, UTF_8) == html)
    assert(http.header("content-length").contains(html.length.toString))
  }

  test("bare (uncompressed) WARC concatenation parses identically") {
    val gz = Warc.encodeWarcGz(crawlTriple("https://x.test/b", "<p>t</p>"))
    // inflate by hand to get the bare concatenated records
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val o = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { o.write(buf, 0, n); n = in.read(buf) }
    val bare = o.toByteArray
    assert(Warc.isWarc(bare) && !Warc.isWarcGz(bare))
    val recs = Warc.parseWarc(bare)
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response"))
    assert(recs.map(_.payload.length) ==
      Warc.parseWarc(gz).map(_.payload.length))
  }

  test("named failures: bad version, missing Content-Length, truncated " +
      "block, missing terminator, non-HTTP response payload") {
    def bare(s: String): Array[Byte] = s.getBytes(UTF_8)
    val eV = intercept[IllegalArgumentException](
      Warc.parseWarc(bare("WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")))
    assert(eV.getMessage.contains("version"), eV.getMessage)
    val eL = intercept[IllegalArgumentException](
      Warc.parseWarc(bare("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n\r\n\r\n")))
    assert(eL.getMessage.contains("Content-Length"), eL.getMessage)
    val eT = intercept[IllegalArgumentException](
      Warc.parseWarc(bare("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n")))
    assert(eT.getMessage.contains("truncated"), eT.getMessage)
    val eE = intercept[IllegalArgumentException](
      Warc.parseWarc(bare("WARC/1.0\r\nContent-Length: 2\r\n\r\nab??")))
    assert(eE.getMessage.contains("CRLFCRLF"), eE.getMessage)
    val eH = intercept[IllegalArgumentException](
      Warc.parseHttp("not http\r\n\r\n".getBytes(UTF_8)))
    assert(eH.getMessage.contains("HTTP status line"), eH.getMessage)
  }

  test("chunked transfer decoding: chunk extension + trailer ignored, " +
      "multi-byte UTF-8 sequences reassemble across chunk boundaries, " +
      "binary path sees the same entity bytes") {
    val text = "héllo — wörld € chunked body"
    val bytes = text.getBytes(UTF_8)
    val payload = Warc.httpResponseBytes(bytes, "text/plain; charset=utf-8",
      chunkSize = 7)
    // the wire form really is chunked: hex sizes + a trailer
    val wire = new String(payload, UTF_8)
    assert(wire.contains("Transfer-Encoding: chunked"))
    assert(wire.contains("7;ext=ignored\r\n"))
    assert(wire.contains("X-Graft-Trailer"))
    val http = Warc.parseHttp(payload)
    assert(http.status == 200)
    assert(http.body.sameElements(bytes), "dechunked entity must be byte-exact")
    assert(new String(http.body, UTF_8) == text)
    // non-chunked form of the same body parses to the same entity
    val plain = Warc.parseHttp(Warc.httpResponseBytes(bytes,
      "text/plain; charset=utf-8"))
    assert(plain.body.sameElements(http.body))
  }

  test("hostile chunk framing fails NAMED: non-hex size, oversize hex " +
      "line, truncated chunk, missing chunk CRLF, missing terminator") {
    def resp(framing: String): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + framing)
        .getBytes(UTF_8)
    val eHex = intercept[IllegalArgumentException](
      Warc.parseHttp(resp("zz\r\nab\r\n0\r\n\r\n")))
    assert(eHex.getMessage.contains("chunk-size"), eHex.getMessage)
    val eBig = intercept[IllegalArgumentException](
      Warc.parseHttp(resp("fffffffff\r\nab\r\n0\r\n\r\n")))
    assert(eBig.getMessage.contains("chunk-size"), eBig.getMessage)
    val eTrunc = intercept[IllegalArgumentException](
      Warc.parseHttp(resp("ff\r\nshort\r\n0\r\n\r\n")))
    assert(eTrunc.getMessage.contains("truncated"), eTrunc.getMessage)
    val eCrlf = intercept[IllegalArgumentException](
      Warc.parseHttp(resp("2\r\nabXX0\r\n\r\n")))
    assert(eCrlf.getMessage.contains("CRLF"), eCrlf.getMessage)
    val eEnd = intercept[IllegalArgumentException](
      Warc.parseHttp(resp("2\r\nab\r\n")))
    assert(eEnd.getMessage.contains("CRLF"), eEnd.getMessage)
  }

  test("charset resolution order: Content-Type param beats meta, meta " +
      "beats the UTF-8 default; latin-1-family labels map to cp1252; " +
      "unknown labels fall back to UTF-8") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // header param wins even when a meta disagrees
    val metaBody = "<meta charset=\"utf-8\"><p>x</p>".getBytes(cp1252)
    assert(Warc.bodyCharset("text/html; charset=iso-8859-1", metaBody)
      == cp1252)
    // meta charset form
    assert(Warc.bodyCharset("text/html",
      "<html><head><meta charset=windows-1252></head>".getBytes(UTF_8))
      == cp1252)
    // http-equiv form
    assert(Warc.bodyCharset("text/html",
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=ISO-8859-1\">").getBytes(UTF_8)) == cp1252)
    // prescan window: a meta beyond 1024 bytes is NOT honored
    val far = (" " * 1100) + "<meta charset=windows-1252>"
    assert(Warc.bodyCharset("text/html", far.getBytes(UTF_8))
      == java.nio.charset.StandardCharsets.UTF_8)
    // defaults + unknown label
    assert(Warc.bodyCharset("text/plain", Array.emptyByteArray)
      == java.nio.charset.StandardCharsets.UTF_8)
    assert(Warc.bodyCharset("text/plain; charset=no-such-charset-99",
      Array.emptyByteArray) == java.nio.charset.StandardCharsets.UTF_8)
    // a cp1252 euro byte (0x80) survives the mapped decode
    val euro = Array[Byte](0x80.toByte)
    assert(new String(euro,
      Warc.bodyCharset("text/plain; charset=latin1", euro)) == "€")
  }

  test("records(): Spark-side 1:N explode keeps doc keys, splits the " +
      "response, passes non-HTTP records through with status -1") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val pages = Seq((7L, "<p>seven</p>"), (8L, "<p>eight</p>"))
      .toDF("doc_id", "html")
      .withColumn("uri", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("https://x.test/"),
        org.apache.spark.sql.functions.col("doc_id")))
    val recs = Warc.records(
      Warc.withWarcGzPayload(pages, "html", "uri").drop("html", "uri"),
      "payload")
    val rows = recs.select("doc_id", "warc_seq", "warc_type", "http_status",
        "content_type", "body")
      .as[(Long, Int, String, Int, String, String)].collect()
    assert(rows.length == 6)
    val resp7 = rows.find(r => r._1 == 7L && r._3 == "response").get
    assert(resp7._4 == 200 && resp7._5.startsWith("text/html") &&
      resp7._6 == "<p>seven</p>")
    val info8 = rows.find(r => r._1 == 8L && r._3 == "warcinfo").get
    assert(info8._4 == -1 && info8._5 == "" &&
      info8._6.startsWith("software: graft"))
    assert(rows.filter(_._1 == 7L).map(_._2).sorted.toSeq == Seq(0, 1, 2))
  }

  test("recordsBinary(): raw HTTP body bytes survive byte-exact (no " +
      "text transcode), non-response payloads pass through raw") {
    val spark = SparkTestSession.get
    import spark.implicits._
    // a body that a UTF-8 transcode would destroy (invalid sequences)
    val bin = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x80.toByte, 0x00,
      0xC0.toByte, 0x1F, 0xFE.toByte)
    val gz = Warc.encodeWarcGz(Seq(
      (Seq("WARC-Type" -> "warcinfo"), "software: g\r\n".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/1"),
        Warc.httpResponse(bin, "image/jpeg"))))
    val rows = Warc.recordsBinary(
        Seq((5L, gz)).toDF("doc_id", "payload"), "payload")
      .select("doc_id", "warc_type", "http_status", "content_type", "body")
      .as[(Long, String, Int, String, Array[Byte])].collect()
    assert(rows.length == 2)
    val resp = rows.find(_._2 == "response").get
    assert(resp._3 == 200 && resp._4 == "image/jpeg")
    assert(resp._5.sameElements(bin), "binary body must be byte-exact")
    val info = rows.find(_._2 == "warcinfo").get
    assert(info._3 == -1 && new String(info._5, UTF_8) == "software: g\r\n")
  }

  test("surt url keys: scheme/port dropped, host lowercased + reversed, " +
      "www stripped, path lowercased, fragment dropped, query kept") {
    assert(Warc.surt("https://www.Example.com/A/B?Q=1#frag")
      == "com,example)/a/b?q=1")
    assert(Warc.surt("http://sub.host.co.uk:8080/") == "uk,co,host,sub)/")
    assert(Warc.surt("https://example.com") == "com,example)/")
    assert(Warc.surt("https://example.com?q=2") == "com,example)/?q=2")
    val e = intercept[IllegalArgumentException](Warc.surt("https:///nohost"))
    assert(e.getMessage.contains("no host"), e.getMessage)
  }

  test("cdxj line round-trip: writer output parses back through " +
      "cdxjRecords with json-escaped values intact; comments dropped") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val line = Warc.cdxjLine("https://www.X.test/p", "20260101000000", Seq(
      "url" -> "https://www.X.test/p",
      "digest" -> "quote\"back\\slash",
      "offset" -> "42"))
    val rows = Warc.cdxjRecords(
        Seq((1L, s"!meta comment\n$line\n")).toDF("doc_id", "cdx"), "cdx")
      .select(col("doc_id"), col("cdx_seq"), col("urlkey"), col("cdx_ts"),
        get_json_object(col("json"), "$['digest']").as("digest"),
        get_json_object(col("json"), "$['offset']").cast("long").as("off"))
      .as[(Long, Int, String, String, String, Long)].collect()
    assert(rows.length == 1, "the ! comment line must be dropped")
    assert(rows(0) == ((1L, 1, "test,x)/p", "20260101000000",
      "quote\"back\\slash", 42L)))
  }

  test("recordsAt: slices decode exactly the picked members (charset " +
      "contract included), bad ranges fail NAMED") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cp1252 = "windows-1252"
    val (blob, idx) = Warc.encodeWarcGzIndexed(Seq(
      (Seq("WARC-Type" -> "warcinfo"), "software: g\r\n".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/1"),
        Warc.httpResponseBytes("plain one".getBytes(UTF_8),
          "text/plain; charset=utf-8")),
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://x/2"),
        Warc.httpResponseBytes("café €".getBytes(cp1252),
          "text/plain; charset=iso-8859-1", chunkSize = 3))))
    assert(idx.length == 3 && idx.map(_._2).sum == blob.length)
    // pick members 2 and 1 (deliberately not in archive order)
    def df(picks: Seq[(Long, Long)]) = Seq(("a", blob, picks))
      .toDF("tag", "payload", "picks")
      .withColumn("picks", expr(
        "transform(picks, p -> struct(p._1 as offset, p._2 as length))"))
    val got = Warc.recordsAt(df(Seq(idx(2), idx(1))), "payload", "picks")
      .select("tag", "slice_seq", "target_uri", "http_status", "body")
      .as[(String, Int, String, Int, String)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got(0) == (("a", 0, "https://x/2", 200, "café €")))
    assert(got(1) == (("a", 1, "https://x/1", 200, "plain one")))
    // a range off the end of the blob
    val eOut = intercept[org.apache.spark.SparkException](
      Warc.recordsAt(df(Seq((blob.length - 4L, 100L))), "payload", "picks")
        .collect())
    assert(eOut.getCause.getMessage.contains("leaves"),
      eOut.getCause.getMessage)
    // a range spanning two members frames 2 records
    val eTwo = intercept[org.apache.spark.SparkException](
      Warc.recordsAt(df(Seq((idx(0)._1, idx(0)._2 + idx(1)._2))),
        "payload", "picks").collect())
    assert(eTwo.getCause.getMessage.contains("records, not 1"),
      eTwo.getCause.getMessage)
    // a mid-member range is corrupt gzip
    val eMid = intercept[org.apache.spark.SparkException](
      Warc.recordsAt(df(Seq((idx(1)._1 + 3, idx(1)._2))), "payload", "picks")
        .collect())
    assert(eMid.getCause.getMessage.contains("gzip"),
      eMid.getCause.getMessage)
  }

  test("WET profile: conversion records surface the page text verbatim " +
      "(no HTTP framing), warcinfo leader dropped, refers-to header kept") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val text = "Line one of doc nine.\nLine two — ünïcode & <brackets>.\nby x"
    val pages = Seq((9L, text), (10L, "short"))
      .toDF("doc_id", "text")
      .withColumn("uri", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("https://x.test/"),
        org.apache.spark.sql.functions.col("doc_id")))
    val gz = Warc.withSidecarGzPayload(pages, "text", "uri",
      "conversion", "text/plain").drop("text", "uri")
    // container level: warcinfo + conversion, refers-to present
    val raw = Warc.parseWarc(
      gz.where($"doc_id" === 9L).select("payload").as[Array[Byte]].head())
    assert(raw.map(_.warcType) == Seq("warcinfo", "conversion"))
    assert(raw(1).header("WARC-Refers-To")
      .contains("<urn:graft:https://x.test/9>"))
    assert(raw(1).header("Content-Type").contains("text/plain"))
    // profile level: one row per conversion record, text byte-exact
    val rows = Warc.wetText(gz, "payload")
      .select("doc_id", "wet_seq", "target_uri", "text")
      .as[(Long, Int, String, String)].collect().sortBy(_._1)
    assert(rows.length == 2, "warcinfo rows must not surface")
    assert(rows(0) == ((9L, 1, "https://x.test/9", text)))
    assert(rows(1)._4 == "short")
  }

  test("WAT profile: metadata records surface the envelope JSON for " +
      "Catalyst-side field extraction (get_json_object bracket paths)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val json = """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":""" +
      """"https://x.test/11"},"Payload-Metadata":{"HTTP-Response-Metadata":""" +
      """{"Response-Message":{"Status":"200"},"HTML-Metadata":""" +
      """{"Head":{"Title":"T11"},"Links":[{"url":"/a"},{"url":"/b"}]}}}}}"""
    val rows = Seq((11L, json)).toDF("doc_id", "wat")
      .withColumn("uri", lit("https://x.test/11"))
    val got = Warc.watJson(
        Warc.withSidecarGzPayload(rows, "wat", "uri",
          "metadata", "application/json").drop("wat", "uri"),
        "payload")
      .select(col("doc_id"), col("target_uri"),
        get_json_object(col("json"),
          "$['Envelope']['WARC-Header-Metadata']['WARC-Target-URI']")
          .as("wuri"),
        get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata']['Head']['Title']").as("title"),
        json_array_length(get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata']['Links']")).as("n_links"))
      .as[(Long, String, String, String, Int)].head()
    assert(got == ((11L, "https://x.test/11", "https://x.test/11",
      "T11", 2)))
  }

  test("zipnum: lookups binary-search the cluster.idx and read ONE " +
      "block; key runs straddling a block boundary extend the scan; " +
      "absent keys return empty; hygiene failures are named") {
    def line(key: String, ts: Long, v: String): String =
      s"$key $ts" + " {\"v\":\"" + v + "\"}"
    // 10 lines, 4 keys, key `c` RUNS across the block-2 boundary
    val lines = Seq(
      line("a)/1", 1, "a1"), line("a)/2", 2, "a2"), line("b)/1", 3, "b1"),
      line("c)/x", 4, "c1"), line("c)/x", 5, "c2"), line("c)/x", 6, "c3"),
      line("c)/x", 7, "c4"), line("c)/x", 8, "c5"), line("d)/1", 9, "d1"),
      line("d)/2", 10, "d2"))
    val (blob, idx) = Warc.encodeZipnum(lines, perBlock = 4)
    assert(idx.size == 3)
    val blockLens = idx.map(_.split("\t")(3).toLong)
    // single-block hit
    val (b1, rb, nb1) = Warc.zipnumLookup(blob, idx, "b)/1")
    assert(b1.size == 1 && b1.head.contains("b1") && rb == blockLens(0) &&
      nb1 == 1)
    // block firsts are a)/1, c)/x, d)/1: the search lands on block 1
    // (first == query) but the run's HEAD line c1 sits at the tail of
    // block 0 — the backward straddle step must pick it up
    val (cs, rc, nbc) = Warc.zipnumLookup(blob, idx, "c)/x")
    assert(cs.size == 5, s"want the full c-run, got ${cs.size}")
    assert(rc == blockLens(0) + blockLens(1) && nbc == 2)
    // absent keys: before every block, and in a gap between keys
    assert(Warc.zipnumLookup(blob, idx, "0)/zero")._1.isEmpty)
    assert(Warc.zipnumLookup(blob, idx, "bzz)/gap")._1.isEmpty)
    // unsorted input and malformed idx lines fail by name
    val eSort = intercept[IllegalArgumentException](
      Warc.encodeZipnum(Seq(line("z)/1", 1, "z"), line("a)/1", 2, "a")), 4))
    assert(eSort.getMessage.contains("SURT-sorted"))
    val eIdx = intercept[IllegalArgumentException](
      Warc.zipnumLookup(blob, Seq("garbage"), "a)/1"))
    assert(eIdx.getMessage.contains("cluster.idx"))
  }

  test("revisit profile: writer emits identical-payload-digest records " +
      "(headers only, digest + refers-to), the walk keeps response + " +
      "revisit rows and gives revisits empty bodies") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val docs = Seq((1L, "alpha body", "https://h.test/1", 3),
        (2L, "beta", "https://h.test/2", 1))
      .toDF("doc_id", "text", "uri", "captures")
    val arch = Warc.withRevisitGzPayload(docs, "text", "uri", "captures")
    // raw container shape for doc 1: warcinfo + response + 2 revisits
    val gz1 = arch.filter($"doc_id" === 1L)
      .select("payload").as[Array[Byte]].head()
    val recs = Warc.parseWarc(gz1)
    assert(recs.map(_.warcType) ==
      Seq("warcinfo", "response", "revisit", "revisit"))
    val rev = recs(2)
    assert(rev.header("WARC-Profile").exists(_.endsWith(
      "identical-payload-digest")))
    assert(rev.header("WARC-Payload-Digest") ==
      recs(1).header("WARC-Payload-Digest"))
    assert(rev.header("WARC-Refers-To-Target-URI")
      .contains("https://h.test/1"))
    assert(rev.header("WARC-Refers-To-Date").contains(
      recs(1).header("WARC-Date").get))
    // digest is the WARC-legal labeled form over the PAYLOAD bytes
    assert(recs(1).header("WARC-Payload-Digest").get ==
      Warc.payloadDigest("alpha body".getBytes(UTF_8)))
    // the walk: responses carry body text + len, revisits carry the
    // digest with an EMPTY body; warcinfo rows are dropped
    val rows = Warc.revisitRecords(arch.drop("text", "uri", "captures"),
        "payload")
      .select("doc_id", "warc_type", "payload_digest", "refers_to_uri",
        "http_status", "body_len", "body")
      .as[(Long, String, String, String, Int, Long, String)].collect()
    assert(rows.length == 4) // 1 resp + 2 rev (doc 1), 1 resp (doc 2)
    val resp1 = rows.find(r => r._1 == 1L && r._2 == "response").get
    assert(resp1._5 == 200 && resp1._6 == 10L && resp1._7 == "alpha body")
    assert(resp1._3.startsWith("md5:") && resp1._4 == "")
    val revs1 = rows.filter(r => r._1 == 1L && r._2 == "revisit")
    assert(revs1.length == 2)
    revs1.foreach { r =>
      assert(r._3 == resp1._3, "revisit must carry the original's digest")
      assert(r._4 == "https://h.test/1" && r._6 == 0L && r._7 == "")
    }
    assert(rows.count(_._1 == 2L) == 1)
    // out-of-range capture counts fail by name
    val bad = Seq((3L, "x", "https://h.test/3", 0))
      .toDF("doc_id", "text", "uri", "captures")
    val e = intercept[org.apache.spark.SparkException] {
      Warc.withRevisitGzPayload(bad, "text", "uri", "captures")
        .select("payload").as[Array[Byte]].head()
    }
    assert(e.getCause != null &&
      e.getCause.getMessage.contains("captures"), String.valueOf(e.getCause))
  }
}
