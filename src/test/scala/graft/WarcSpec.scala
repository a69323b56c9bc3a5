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
}
