package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/**
 * WARC (Web ARChive, ISO 28500) container walk — the format crawl
 * corpora actually arrive in (Common Crawl WARC/WET dumps): per-record
 * gzip members (the layout that makes .warc.gz randomly seekable),
 * WARC/1.x record headers, Content-Length-framed payload blocks, and
 * the HTTP response framing inside `response` records. Pure JDK-zlib +
 * byte arithmetic, same discipline as the media codecs; paired with
 * [[Html.extractText]] it makes the crawl-bytes → clean-text front
 * half of a curation pipeline real end-to-end (`io_warc_extract`).
 *
 * Supported tier: WARC/1.0 and 1.1, gzip-member or bare concatenated
 * records, any record type (warcinfo/request/response/metadata/...),
 * HTTP/1.x status + header parse for response payloads. Loud NAMED
 * failures: missing version line, header without a colon, missing
 * Content-Length, truncated payload block, missing CRLFCRLF record
 * terminator, response payload without an HTTP status line.
 *
 * 100 TB shape: parsing is partition-local per payload — a .warc.gz is
 * NOT splittable mid-file, so (like `io_gzip_jsonl` documents) ingest
 * shards across many archive files, one task each, and re-frames to
 * parquet immediately; records (small) shuffle, archive blobs never.
 */
object Warc {

  /** One WARC record: headers in original order (names case-preserved)
   *  plus the raw payload block. */
  final case class Record(headers: Seq[(String, String)], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
  }

  /** Parsed HTTP message from a response/request record payload:
   *  (status code, headers, body bytes). */
  final case class Http(status: Int, headers: Seq[(String, String)],
      body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def contentType: String = header("Content-Type").getOrElse("")
  }

  def isWarcGz(p: Array[Byte]): Boolean =
    p != null && p.length >= 2 && (p(0) & 0xFF) == 0x1F && (p(1) & 0xFF) == 0x8B

  def isWarc(p: Array[Byte]): Boolean =
    p != null && (isWarcGz(p) ||
      (p.length >= 5 && p(0) == 'W' && p(1) == 'A' && p(2) == 'R' &&
        p(3) == 'C' && p(4) == '/'))

  // --------------------------------------------------------------- decode

  /** Inflate a (possibly multi-member) gzip stream; bare input passes
   *  through. JDK GZIPInputStream consumes concatenated members — the
   *  Common Crawl record-per-member layout reads as one stream. */
  private def gunzipAll(p: Array[Byte]): Array[Byte] =
    if (!isWarcGz(p)) p
    else try ZlibPool.gunzip(p) // thread-local Inflater, GZIPInputStream
                                // semantics pinned by ZlibPoolSpec
    catch {
      // crawl shards carry bit rot: name it instead of leaking a raw
      // ZipException/EOFException out of a task
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"corrupt gzip member in WARC payload: ${e.getMessage}", e)
    }

  /** Walk every record of a .warc / .warc.gz payload. */
  def parseWarc(p0: Array[Byte]): Seq[Record] = {
    require(isWarc(p0), "not a WARC payload (no gzip magic or WARC/ version line)")
    val p = gunzipAll(p0)
    val out = Seq.newBuilder[Record]
    var at = 0
    while (at < p.length) {
      // version line
      val vEnd = crlfAt(p, at)
      val version = new String(p, at, vEnd - at, UTF_8)
      require(version.startsWith("WARC/1."),
        s"bad WARC version line '$version' at byte $at")
      at = vEnd + 2
      // headers until the blank line
      val hdrs = Seq.newBuilder[(String, String)]
      var contentLength = -1L
      var blank = false
      while (!blank) {
        val lEnd = crlfAt(p, at)
        if (lEnd == at) blank = true
        else {
          val line = new String(p, at, lEnd - at, UTF_8)
          val colon = line.indexOf(':')
          require(colon > 0, s"WARC header without a colon: '$line'")
          val k = line.substring(0, colon).trim
          val v = line.substring(colon + 1).trim
          hdrs += ((k, v))
          if (k.equalsIgnoreCase("Content-Length")) contentLength = v.toLong
        }
        at = lEnd + 2
      }
      require(contentLength >= 0, "WARC record missing Content-Length")
      require(at + contentLength <= p.length,
        s"truncated WARC payload block ($contentLength B at $at, ${p.length} total)")
      val payload = java.util.Arrays.copyOfRange(p, at,
        at + contentLength.toInt)
      at += contentLength.toInt
      require(at + 4 <= p.length && p(at) == '\r' && p(at + 1) == '\n' &&
        p(at + 2) == '\r' && p(at + 3) == '\n',
        s"WARC record missing CRLFCRLF terminator at byte $at")
      at += 4
      out += Record(hdrs.result(), payload)
    }
    val records = out.result()
    require(records.nonEmpty, "WARC payload has no records")
    records
  }

  /** Split an HTTP/1.x message payload (response or request record
   *  block) into status + headers + body. A `Transfer-Encoding:
   *  chunked` body is DECHUNKED here (raw WARC captures preserve the
   *  wire framing), so `Http.body` always holds entity bytes — the
   *  binary media path and the text path both see transfer decoding. */
  def parseHttp(payload: Array[Byte]): Http = {
    val lEnd = crlfAt(payload, 0)
    val statusLine = new String(payload, 0, lEnd, UTF_8)
    require(statusLine.startsWith("HTTP/1."),
      s"WARC http payload without an HTTP status line: '${statusLine.take(40)}'")
    val sp = statusLine.indexOf(' ')
    require(sp > 0 && statusLine.length >= sp + 4,
      s"malformed HTTP status line '$statusLine'")
    val status = statusLine.substring(sp + 1, sp + 4).toInt
    var at = lEnd + 2
    val hdrs = Seq.newBuilder[(String, String)]
    var blank = false
    while (!blank) {
      val e = crlfAt(payload, at)
      if (e == at) blank = true
      else {
        val line = new String(payload, at, e - at, UTF_8)
        val colon = line.indexOf(':')
        require(colon > 0, s"HTTP header without a colon: '$line'")
        hdrs += ((line.substring(0, colon).trim, line.substring(colon + 1).trim))
      }
      at = e + 2
    }
    val headers = hdrs.result()
    val chunked = headers.exists { case (k, v) =>
      k.equalsIgnoreCase("Transfer-Encoding") &&
        v.toLowerCase(java.util.Locale.ROOT).contains("chunked")
    }
    val body =
      if (chunked) dechunk(payload, at)
      else java.util.Arrays.copyOfRange(payload, at, payload.length)
    Http(status, headers, body)
  }

  /** RFC 9112 §7.1 chunked transfer decoding: hex size line (chunk
   *  extensions after ';' ignored), chunk data, CRLF, repeated to the
   *  zero chunk, then optional trailer fields to a blank line. Loud
   *  NAMED failures on hostile framing: non-hex or empty size, a size
   *  line over 8 hex digits (a >4 GiB chunk is bogus in a capture),
   *  truncated chunk data, missing chunk-terminating CRLF, missing
   *  zero-chunk/trailer terminator. Total output is bounded by the
   *  payload length, so no inflation guard is needed. */
  private def dechunk(p: Array[Byte], from: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(math.max(16, p.length - from))
    var at = from
    var done = false
    while (!done) {
      val e = crlfAt(p, at)
      val line = new String(p, at, e - at, UTF_8)
      val semi = line.indexOf(';')
      val hex = (if (semi >= 0) line.substring(0, semi) else line).trim
      require(hex.nonEmpty && hex.length <= 8 &&
        hex.forall(c => Character.digit(c, 16) >= 0),
        s"bad HTTP chunk-size line '${line.take(40)}'")
      val n = java.lang.Long.parseLong(hex, 16)
      at = e + 2
      if (n == 0L) {
        // trailer fields (ignored) until the blank line
        var blank = false
        while (!blank) {
          val te = crlfAt(p, at)
          if (te == at) blank = true
          at = te + 2
        }
        done = true
      } else {
        require(at + n <= p.length, s"truncated HTTP chunk ($n B at $at, " +
          s"${p.length} total)")
        o.write(p, at, n.toInt)
        at += n.toInt
        require(at + 1 < p.length && p(at) == '\r' && p(at + 1) == '\n',
          s"HTTP chunk missing terminating CRLF at byte $at")
        at += 2
      }
    }
    o.toByteArray
  }

  private def crlfAt(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < p.length && !(p(i) == '\r' && p(i + 1) == '\n')) i += 1
    require(i + 1 < p.length, s"missing CRLF after byte $from")
    i
  }

  // --------------------------------------------------------------- encode

  /** Serialize records as a .warc.gz with ONE GZIP MEMBER PER RECORD
   *  (the Common Crawl layout). Adds Content-Length; everything else is
   *  caller-supplied so fixtures stay deterministic. */
  def encodeWarcGz(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] =
    encodeWarcGzIndexed(records)._1

  /** [[encodeWarcGz]] plus the per-member (offset, length) index — the
   *  byte ranges a CDX sidecar records so consumers can range-read ONE
   *  record out of a multi-GiB archive. Each member is independently
   *  gunzippable, which is the whole point of the record-per-member
   *  layout. */
  def encodeWarcGzIndexed(records: Seq[(Seq[(String, String)], Array[Byte])])
      : (Array[Byte], Seq[(Long, Long)]) = {
    require(records.nonEmpty, "WARC archive needs at least one record")
    val o = new ByteArrayOutputStream(512)
    val idx = Seq.newBuilder[(Long, Long)]
    records.foreach { case (hdrs, payload) =>
      val before = o.size()
      val r = new ByteArrayOutputStream(payload.length + 128)
      def line(s: String): Unit = { r.write(s.getBytes(UTF_8)); r.write('\r'); r.write('\n') }
      line("WARC/1.0")
      hdrs.foreach { case (k, v) =>
        // a colon inside the name would re-parse split at the wrong spot
        require(!k.contains(':') && !k.contains('\r') && !k.contains('\n'),
          s"bad WARC header name '$k'")
        line(s"$k: $v")
      }
      line(s"Content-Length: ${payload.length}")
      line("")
      r.write(payload, 0, payload.length)
      r.write('\r'); r.write('\n'); r.write('\r'); r.write('\n')
      // byte-identical to GZIPOutputStream(write+finish) on a reused
      // thread-local Deflater — the offsets below hash the byte geometry
      ZlibPool.gzipMember(o, r.toByteArray)
      idx += ((before.toLong, (o.size() - before).toLong))
    }
    (o.toByteArray, idx.result())
  }

  // ------------------------------------------------------------- CDX(J)

  /** SURT (Sort-friendly URI Reordering Transform) url key, the CDX
   *  sort key: scheme dropped, host lowercased, a leading `www.`
   *  stripped, labels reversed and comma-joined, `)` then the path
   *  (query kept, fragment dropped) — `https://www.Example.com/A?q=1`
   *  → `com,example)/a?q=1`. The lowercase-whole-key form matches what
   *  Common Crawl's cdxj indexes carry. */
  def surt(url: String): String = {
    val noScheme = {
      val i = url.indexOf("://")
      if (i >= 0) url.substring(i + 3) else url
    }
    val hostEnd = noScheme.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (hostPort, rest) =
      if (hostEnd < 0) (noScheme, "/")
      else (noScheme.substring(0, hostEnd), noScheme.substring(hostEnd))
    val host0 = hostPort.takeWhile(_ != ':').toLowerCase(java.util.Locale.ROOT)
    val host = if (host0.startsWith("www.")) host0.substring(4) else host0
    require(host.nonEmpty, s"surt: url '$url' has no host")
    val path = rest.takeWhile(_ != '#') match {
      case "" => "/"
      case p if p.startsWith("?") => "/" + p
      case p => p
    }
    host.split('.').reverse.mkString(",") + ")" +
      path.toLowerCase(java.util.Locale.ROOT)
  }

  /** One CDXJ index line: `surt-key timestamp {json}` with the json
   *  fields in caller order, values JSON-string-quoted (the Common
   *  Crawl cdxj value convention — offsets and lengths are strings). */
  def cdxjLine(url: String, timestamp: String,
      fields: Seq[(String, String)]): String = {
    require(timestamp.nonEmpty && timestamp.forall(_.isDigit),
      s"bad CDX timestamp '$timestamp'")
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    surt(url) + " " + timestamp + " {" +
      fields.map { case (k, v) => q(k) + ":" + q(v) }.mkString(",") + "}"
  }

  /** CDX(J) sidecar walk — one row per index line: (kept input
   *  columns..., cdx_seq, urlkey, cdx_ts, json). Stays entirely inside
   *  Catalyst (split/explode + regexp field split; callers pull json
   *  fields with `get_json_object`, the WAT convention). Blank lines
   *  and `!` comment/metadata lines are dropped. 100 TB shape: per-row
   *  1:N explode of slim text — an index line is ~200 B against the
   *  ~500 KB archive record it points at; nothing here shuffles. */
  def cdxjRecords(df: org.apache.spark.sql.DataFrame,
      cdxCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(df.columns.map(col) :+
        posexplode(split(col(cdxCol), "\n")).as(Seq("cdx_seq", "__line")): _*)
      .where(trim(col("__line")) =!= "" && !col("__line").startsWith("!"))
      .withColumn("urlkey", regexp_extract(col("__line"),
        "^(\\S+) (\\d+) (\\{.*\\})$", 1))
      .withColumn("cdx_ts", regexp_extract(col("__line"),
        "^(\\S+) (\\d+) (\\{.*\\})$", 2))
      .withColumn("json", regexp_extract(col("__line"),
        "^(\\S+) (\\d+) (\\{.*\\})$", 3))
      .drop("__line", cdxCol)
  }

  /** OFFSET-SEEK RECORD SLICE — the CDX random-access path: decode
   *  ONLY the records named by `picksCol` (an array of
   *  struct<offset:long, length:long> byte ranges into `payloadCol`),
   *  each range one gzip member, instead of walking the whole archive.
   *  Output rows match [[records]] (same HTTP split, same
   *  charset-aware text contract) plus `slice_seq` (the pick's index
   *  in the array). Loud NAMED failures on a range that leaves the
   *  blob, lands mid-member, or frames more than one record.
   *
   *  100 TB shape: THE reason CDX sidecars exist — a consumer joins
   *  slim index picks to archives and range-reads selected records
   *  only; in-plan, the archive blob is scanned once per row and never
   *  shuffles (picks are aggregated per archive before the join). */
  // -------------------------------------------------------------- zipnum

  /** ZipNum cluster shard: SURT-sorted cdxj `lines` packed `perBlock`
   *  per independently-gunzippable gzip member. Returns (shard blob,
   *  cluster.idx lines `firstKey TAB timestamp TAB offset TAB length
   *  TAB blockNo`) — the TWO-LEVEL index Common Crawl serves as
   *  cdx-NNNNN.gz + cluster.idx: a consumer binary-searches the tiny
   *  secondary index and decompresses ONE block instead of the shard.
   *  Production uses 3000 lines/block; the cap mirrors that. */
  def encodeZipnum(lines: Seq[String],
      perBlock: Int): (Array[Byte], Seq[String]) = {
    require(perBlock >= 1 && perBlock <= 3000,
      s"encodeZipnum: perBlock $perBlock outside [1, 3000]")
    require(lines.nonEmpty, "encodeZipnum: no cdxj lines")
    lines.iterator.sliding(2).withPartial(false).foreach { w =>
      require(w(0) <= w(1),
        s"encodeZipnum: cdxj lines must be SURT-sorted " +
          s"('${w(1).take(40)}' after '${w(0).take(40)}')")
    }
    val o = new ByteArrayOutputStream(1024)
    val idx = Seq.newBuilder[String]
    lines.grouped(perBlock).zipWithIndex.foreach { case (block, bno) =>
      val before = o.size()
      ZlibPool.gzipMember(o, (block.mkString("\n") + "\n").getBytes(UTF_8))
      val parts = block.head.split(" ", 3)
      require(parts.length >= 2,
        s"encodeZipnum: malformed cdxj line '${block.head.take(60)}'")
      idx += s"${parts(0)}\t${parts(1)}\t$before\t${o.size() - before}\t$bno"
    }
    (o.toByteArray, idx.result())
  }

  /** Random-access lookup: binary-search the cluster.idx for `urlkey`,
   *  gunzip ONLY the covering block(s), return (matching cdxj lines,
   *  COMPRESSED bytes actually read) — the second value is the
   *  at-scale cost and callers assert it stays one block for unique
   *  keys. Straddle rule: the search lands on the LAST block whose
   *  first key <= urlkey (every later block starts past the key, so
   *  there is no forward extension); when that block's first key
   *  EQUALS the query the run may have started earlier, so the scan
   *  walks BACK through blocks whose first key is still the query plus
   *  the one block before them (its tail can hold the run's head). */
  def zipnumLookup(blob: Array[Byte], idxLines: Seq[String],
      urlkey: String): (Seq[String], Long, Int) = {
    require(idxLines.nonEmpty, "zipnumLookup: empty cluster.idx")
    val entries = idxLines.map { l =>
      val p = l.split("\t")
      require(p.length == 5,
        s"zipnumLookup: malformed cluster.idx line '${l.take(60)}'")
      (p(0), p(2).toLong, p(3).toLong)
    }
    var lo = 0
    var hi = entries.size - 1
    var at = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (entries(mid)._1 <= urlkey) { at = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (at < 0) (Seq.empty, 0L, 0) // the key sorts before every block
    else {
      var start = at
      while (start > 0 && entries(start)._1 == urlkey) start -= 1
      var read = 0L
      val out = Seq.newBuilder[String]
      (start to at).foreach { b =>
        val (_, off, len) = entries(b)
        require(off >= 0 && len > 0 && off + len <= blob.length,
          s"zipnumLookup: block [$off, ${off + len}) leaves the " +
            s"${blob.length}-byte shard")
        read += len
        val bytes = gunzipAll(java.util.Arrays.copyOfRange(
          blob, off.toInt, (off + len).toInt))
        new String(bytes, UTF_8).split("\n").foreach { line =>
          if (line.startsWith(urlkey + " ")) out += line
        }
      }
      (out.result(), read, at - start + 1)
    }
  }

  def recordsAt(df: org.apache.spark.sql.DataFrame, payloadCol: String,
      picksCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val picksIdx = inSchema.fieldIndex(picksCol)
    val kept = inSchema.fields.zipWithIndex
      .filter { case (_, i) => i != payloadIdx && i != picksIdx }
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("slice_seq", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("http_status", IntegerType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("body", StringType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](payloadIdx)
        val picks = r.getSeq[Row](picksIdx)
        picks.zipWithIndex.map { case (p, i) =>
          val off = p.getLong(0)
          val len = p.getLong(1)
          require(off >= 0 && len > 0 && off + len <= blob.length,
            s"CDX slice [$off, ${off + len}) leaves the ${blob.length}-byte archive")
          val slice = java.util.Arrays.copyOfRange(blob, off.toInt,
            (off + len).toInt)
          val recs = parseWarc(slice)
          require(recs.length == 1,
            s"CDX slice [$off, ${off + len}) frames ${recs.length} records, not 1")
          val rec = recs.head
          val (status, ctype, body) =
            if (rec.warcType == "response") {
              val h = parseHttp(rec.payload)
              val text = if (isTextContentType(h.contentType))
                new String(h.body, bodyCharset(h.contentType, h.body))
              else ""
              (h.status, h.contentType, text)
            } else (-1, "", new String(rec.payload, UTF_8))
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++
            Seq[Any](i, rec.warcType, rec.targetUri, status, ctype, body))
        }
      }
    }(encoder)
  }

  /** Content types whose bodies are safe to surface as UTF-8 text.
   *  Empty / missing Content-Type counts as text (WARC metadata
   *  records and header-less HTTP bodies are text in practice). */
  private def isTextContentType(ct: String): Boolean = {
    val c = ct.toLowerCase(java.util.Locale.ROOT)
    c.isEmpty || c.startsWith("text/") || c.contains("json") ||
      c.contains("xml") || c.contains("javascript") ||
      c.contains("x-www-form-urlencoded")
  }

  private val CharsetParamRe = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9_.:+-]+)")
  // matches both <meta charset=...> and the http-equiv Content-Type
  // form (whose content attribute contains charset=... inside the tag)
  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]*charset\\s*=\\s*['\"]?\\s*([A-Za-z0-9_.:+-]+)")

  /** Map a charset label to a JDK charset. Follows the WHATWG encoding
   *  mapping where it matters for crawl text: iso-8859-1 / latin1 /
   *  us-ascii labels decode as windows-1252 (its superset — bytes
   *  0x80–0x9F are the typographic quotes/euro real "latin-1" pages
   *  actually carry, not C1 controls). Unknown labels return None (the
   *  caller falls back to UTF-8) — a typo'd header must not kill a
   *  100 TB scan. */
  def charsetFromLabel(label: String): Option[java.nio.charset.Charset] =
    label.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "" => None
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" =>
        Some(UTF_8)
      case "iso-8859-1" | "iso8859-1" | "iso_8859-1" | "latin1" |
           "latin-1" | "l1" | "us-ascii" | "ascii" | "windows-1252" |
           "cp1252" | "x-cp1252" =>
        Some(java.nio.charset.Charset.forName("windows-1252"))
      case other =>
        try Some(java.nio.charset.Charset.forName(other))
        catch { case _: IllegalArgumentException |
                     _: java.nio.charset.UnsupportedCharsetException => None }
    }

  /** Charset for a text response body, in the order real crawl
   *  consumers resolve it: the Content-Type `charset` parameter, then
   *  an HTML meta prescan over the first 1024 body bytes (the HTML5
   *  prescan window, byte-transparently decoded as latin-1), then
   *  UTF-8. */
  def bodyCharset(contentType: String,
      body: Array[Byte]): java.nio.charset.Charset = {
    val fromHeader = {
      val m = CharsetParamRe.matcher(contentType)
      if (m.find()) charsetFromLabel(m.group(1)) else None
    }
    fromHeader.orElse {
      val window = new String(body, 0, math.min(body.length, 1024),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val m = MetaCharsetRe.matcher(window)
      if (m.find()) charsetFromLabel(m.group(1)) else None
    }.getOrElse(UTF_8)
  }

  // ------------------------------------------------------------------ op

  /** Explode a .warc(.gz) payload column into one row per record:
   *  (warc_seq, warc_type, target_uri, http_status, content_type,
   *  body). HTTP framing is split for response records
   *  (http_status = -1 and raw payload text otherwise).
   *
   *  TEXT-ONLY body contract: `body` is a StringType column for the
   *  text-extraction chain. Response bodies whose Content-Type is not
   *  text-like (a "text/" prefix, json, xml, javascript) arrive as an EMPTY
   *  string rather than a lossy UTF-8 transcode of binary bytes —
   *  image/gzip payloads keep their type + status metadata only. Route
   *  binary payloads through the multimodal codecs instead.
   *
   *  CHARSET-AWARE: text bodies transcode via [[bodyCharset]]
   *  (Content-Type charset parameter → HTML meta prescan → UTF-8;
   *  latin-1-family labels decode as windows-1252 per the WHATWG
   *  mapping) — a blind UTF-8 decode would mojibake the ~10–20% of
   *  real crawl responses labeled ISO-8859-1/windows-1252 and poison
   *  langid/quality/dedup downstream. Chunked transfer framing is
   *  removed in [[parseHttp]] before any decode.
   *
   *  Partition-local 1:N explode — payload dropped so record rows
   *  shuffle, archive blobs never; lazy over the partition iterator. */
  def records(df: org.apache.spark.sql.DataFrame,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("warc_seq", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("http_status", IntegerType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("body", StringType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseWarc(r.getAs[Array[Byte]](payloadIdx)).zipWithIndex.map {
          case (rec, i) =>
            val isHttp = rec.warcType == "response"
            val (status, ctype, body) =
              if (isHttp) {
                val h = parseHttp(rec.payload)
                val text = if (isTextContentType(h.contentType))
                  new String(h.body, bodyCharset(h.contentType, h.body))
                else ""
                (h.status, h.contentType, text)
              } else (-1, "", new String(rec.payload, UTF_8))
            Row.fromSeq(keptIdx.toSeq.map(r.get) ++
              Seq[Any](i, rec.warcType, rec.targetUri, status, ctype, body))
        }
      }
    }(encoder)
  }

  /** BINARY-BODY record walk — the media-ingest profile: one row per
   *  record like [[records]], but `body` is a BinaryType column holding
   *  the RAW HTTP body bytes (responses) or the raw payload block
   *  (other record types), with no Content-Type gating — this is how
   *  crawl archives feed the multimodal codecs
   *  ([[Multimodal.imagePhash]], the container decoders behind
   *  SniffCodec) without a lossy text transcode. Same 100 TB shape as
   *  [[records]]: partition-local 1:N explode, archive blobs dropped
   *  before anything shuffles. */
  def recordsBinary(df: org.apache.spark.sql.DataFrame,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("warc_seq", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("http_status", IntegerType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("body", BinaryType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseWarc(r.getAs[Array[Byte]](payloadIdx)).zipWithIndex.map {
          case (rec, i) =>
            val (status, ctype, body) =
              if (rec.warcType == "response") {
                val h = parseHttp(rec.payload)
                (h.status, h.contentType, h.body)
              } else (-1, "", rec.payload)
            Row.fromSeq(keptIdx.toSeq.map(r.get) ++
              Seq[Any](i, rec.warcType, rec.targetUri, status, ctype, body))
        }
      }
    }(encoder)
  }

  // ------------------------------------------------------- WET/WAT profiles

  /** WET profile (Common Crawl extracted-text sidecars): one row per
   *  `conversion` record — (kept input columns..., wet_seq, target_uri,
   *  text). Real corpus users consume WET, not raw WARC: the conversion
   *  record's payload IS the page text (no HTTP framing), so this is
   *  the record walk + the profile's type filter and the text contract
   *  made explicit. 100 TB shape: identical to [[records]] — the
   *  archive blob never shuffles, slim text rows do. */
  def wetText(df: org.apache.spark.sql.DataFrame,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    records(df, payloadCol)
      .where(col("warc_type") === "conversion")
      .withColumnRenamed("warc_seq", "wet_seq")
      .withColumnRenamed("body", "text")
      .drop("http_status", "content_type")
  }

  /** WAT profile (Common Crawl metadata sidecars): one row per
   *  `metadata` record — (kept input columns..., wat_seq, target_uri,
   *  json). The payload is the Envelope JSON; callers pull fields with
   *  `get_json_object` (bracket paths for the hyphenated Common Crawl
   *  keys: `$$['Envelope']['WARC-Header-Metadata']...`), keeping the
   *  JSON walk inside Catalyst instead of a custom parser. */
  def watJson(df: org.apache.spark.sql.DataFrame,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    records(df, payloadCol)
      .where(col("warc_type") === "metadata")
      .withColumnRenamed("warc_seq", "wat_seq")
      .withColumnRenamed("body", "json")
      .drop("http_status", "content_type")
  }

  /** Append a .warc.gz `payload` carrying a warcinfo leader plus ONE
   *  record of `warcType` whose block is `bodyCol`'s bytes — the
   *  WET (`conversion`, text/plain) and WAT (`metadata`,
   *  application/json) sidecar layouts. Deterministic like
   *  [[withWarcGzPayload]] so oracles replay the content. */
  def withSidecarGzPayload(df: org.apache.spark.sql.DataFrame,
      bodyCol: String, uriCol: String, warcType: String,
      contentType: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val bodyIdx = inSchema.fieldIndex(bodyCol)
    val uriIdx = inSchema.fieldIndex(uriCol)
    val outSchema = StructType(inSchema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val date = "2026-01-01T00:00:00Z"
    df.mapPartitions { rows =>
      rows.map { r =>
        val uri = r.getString(uriIdx)
        val body = r.getString(bodyIdx).getBytes(UTF_8)
        val gz = encodeWarcGz(Seq(
          (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date),
            "software: graft\r\nformat: WARC File Format 1.0\r\n"
              .getBytes(UTF_8)),
          (Seq("WARC-Type" -> warcType, "WARC-Target-URI" -> uri,
            "WARC-Date" -> date, "WARC-Refers-To" -> s"<urn:graft:$uri>",
            "Content-Type" -> contentType),
            body)))
        Row.fromSeq(r.toSeq :+ gz)
      }
    }(encoder)
  }

  /** An HTTP/1.1 200 response payload with explicit body BYTES and
   *  optional chunked framing: `chunkSize > 0` splits the body into
   *  chunks of that many bytes (a chunk extension on the first chunk
   *  and a trailer field after the zero chunk — shapes a decoder must
   *  ignore per RFC 9112), `0` uses Content-Length. Deterministic, so
   *  charset/chunked oracles replay the content. */
  def httpResponseBytes(body: Array[Byte], contentType: String,
      chunkSize: Int = 0): Array[Byte] = {
    val h = new ByteArrayOutputStream(body.length + 160)
    def w(s: String): Unit = h.write(s.getBytes(UTF_8))
    w("HTTP/1.1 200 OK\r\n")
    if (contentType.nonEmpty) w(s"Content-Type: $contentType\r\n")
    if (chunkSize > 0) {
      w("Transfer-Encoding: chunked\r\n\r\n")
      var at = 0
      var first = true
      while (at < body.length) {
        val n = math.min(chunkSize, body.length - at)
        w(java.lang.Integer.toHexString(n) +
          (if (first) ";ext=ignored" else "") + "\r\n")
        h.write(body, at, n)
        w("\r\n")
        at += n
        first = false
      }
      w("0\r\nX-Graft-Trailer: t\r\n\r\n")
    } else {
      w(s"Content-Length: ${body.length}\r\n\r\n")
      h.write(body, 0, body.length)
    }
    h.toByteArray
  }

  /** An HTTP/1.1 200 response payload with a text/html body. */
  def httpResponse(body: Array[Byte],
      contentType: String = "text/html; charset=UTF-8"): Array[Byte] = {
    val h = new ByteArrayOutputStream(body.length + 96)
    h.write(("HTTP/1.1 200 OK\r\nContent-Type: " + contentType +
      s"\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
    h.write(body, 0, body.length)
    h.toByteArray
  }

  /** Append a .warc.gz `payload` holding the Common Crawl per-page
   *  record triple — warcinfo, request (raw GET bytes), response
   *  (HTTP 200 wrapping the `htmlCol` page) — one gzip member each,
   *  WARC-Target-URI taken from `uriCol`. Deterministic (fixed date,
   *  no record ids beyond the URI) so oracles replay the content. */
  def withWarcGzPayload(df: org.apache.spark.sql.DataFrame, htmlCol: String,
      uriCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val htmlIdx = inSchema.fieldIndex(htmlCol)
    val uriIdx = inSchema.fieldIndex(uriCol)
    val outSchema = StructType(inSchema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val date = "2026-01-01T00:00:00Z"
    df.mapPartitions { rows =>
      rows.map { r =>
        val uri = r.getString(uriIdx)
        val html = r.getString(htmlIdx).getBytes(UTF_8)
        val gz = encodeWarcGz(Seq(
          (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date),
            s"software: graft\r\nformat: WARC File Format 1.0\r\n".getBytes(UTF_8)),
          (Seq("WARC-Type" -> "request", "WARC-Target-URI" -> uri,
            "WARC-Date" -> date),
            s"GET $uri HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8)),
          (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
            "WARC-Date" -> date),
            httpResponse(html))))
        Row.fromSeq(r.toSeq :+ gz)
      }
    }(encoder)
  }

  // ---------------------------------------------------- revisit profile

  /** WARC-spec labeled payload digest (`algorithm ":" value`, WARC 1.1
   *  §5.9): md5 hex rather than Common Crawl's sha1:base32, because the
   *  cross-engine oracle must replay digest VALUES exactly (DuckDB
   *  `md5()` ≡ Spark `md5()` over the same UTF-8 bytes); the header
   *  semantics — identical-payload-digest revisit dedup — are
   *  algorithm-agnostic by design in the spec. */
  def payloadDigest(body: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(body)
    val sb = new StringBuilder(36)
    sb.append("md5:")
    d.foreach(b => sb.append(f"$b%02x"))
    sb.toString
  }

  /** Append a .warc.gz `payload` holding one response capture plus
   *  `capturesCol - 1` REVISIT records (WARC 1.1 §6.7.2
   *  identical-payload-digest profile — how real crawls store a
   *  re-fetch whose payload is byte-identical to a prior capture:
   *  response headers only, no body, WARC-Payload-Digest +
   *  WARC-Refers-To-Target-URI/Date naming the original). Bodies are
   *  text/plain `textCol` bytes so oracles replay digests and lengths
   *  from table columns. Deterministic: fixed dates, no record ids. */
  def withRevisitGzPayload(df: org.apache.spark.sql.DataFrame,
      textCol: String, uriCol: String,
      capturesCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val textIdx = inSchema.fieldIndex(textCol)
    val uriIdx = inSchema.fieldIndex(uriCol)
    val capIdx = inSchema.fieldIndex(capturesCol)
    val outSchema = StructType(inSchema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val date0 = "2026-01-01T00:00:00Z"
    df.mapPartitions { rows =>
      rows.map { r =>
        val uri = r.getString(uriIdx)
        val body = r.getString(textIdx).getBytes(UTF_8)
        val captures = r.getInt(capIdx)
        require(captures >= 1 && captures <= 64,
          s"withRevisitGzPayload: captures $captures outside [1, 64]")
        val dg = payloadDigest(body)
        val headersOnly =
          "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=UTF-8\r\n\r\n"
            .getBytes(UTF_8)
        val recs =
          Seq((Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date0),
            "software: graft\r\nformat: WARC File Format 1.1\r\n"
              .getBytes(UTF_8)),
          (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
            "WARC-Date" -> date0, "WARC-Payload-Digest" -> dg),
            httpResponse(body, "text/plain; charset=UTF-8"))) ++
          (1 until captures).map { k =>
            (Seq("WARC-Type" -> "revisit", "WARC-Target-URI" -> uri,
              "WARC-Date" -> f"2026-01-${k + 1}%02dT00:00:00Z",
              "WARC-Profile" ->
                "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
              "WARC-Payload-Digest" -> dg,
              "WARC-Refers-To-Target-URI" -> uri,
              "WARC-Refers-To-Date" -> date0),
              headersOnly)
          }
        Row.fromSeq(r.toSeq :+ encodeWarcGz(recs))
      }
    }(encoder)
  }

  /** REVISIT-profile record walk: one row per `response` or `revisit`
   *  record — (kept input columns..., warc_seq, warc_type, target_uri,
   *  payload_digest, refers_to_uri, http_status, body_len, body). A
   *  revisit carries its original's digest and an empty body; joining
   *  (or grouping) captures on `payload_digest` IS the
   *  identical-payload-digest dedup relation real crawl consumers use
   *  to account stored-vs-saved bytes. 100 TB shape: identical to
   *  [[records]] — per-payload linear decode, archive blobs dropped
   *  before anything shuffles; digest strings are 36 bytes/row. */
  def revisitRecords(df: org.apache.spark.sql.DataFrame,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("warc_seq", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("payload_digest", StringType, nullable = false),
      StructField("refers_to_uri", StringType, nullable = false),
      StructField("http_status", IntegerType, nullable = false),
      StructField("body_len", LongType, nullable = false),
      StructField("body", StringType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseWarc(r.getAs[Array[Byte]](payloadIdx)).zipWithIndex.collect {
          case (rec, i)
              if rec.warcType == "response" || rec.warcType == "revisit" =>
            val h = parseHttp(rec.payload)
            val text = if (isTextContentType(h.contentType))
              new String(h.body, bodyCharset(h.contentType, h.body))
            else ""
            Row.fromSeq(keptIdx.toSeq.map(r.get) ++ Seq[Any](
              i, rec.warcType, rec.targetUri,
              rec.header("WARC-Payload-Digest").getOrElse(""),
              rec.header("WARC-Refers-To-Target-URI").getOrElse(""),
              h.status, h.body.length.toLong, text))
        }
      }
    }(encoder)
  }
}
