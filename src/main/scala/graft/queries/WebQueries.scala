package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.{C4Clean, Html, TextAnalysis}
import org.apache.spark.sql.graft.HtmlText
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Web-curation stage-zero queries (SURVEY.md §2.6 north-star additions):
 * HTML -> text extraction and its composition with the existing C4 /
 * Gopher cleaning stages — the front half of a crawl-to-corpus pipeline.
 *
 * Oracle strategy: the HTML wrapper around each document is DETERMINISTIC
 * and built from document columns only, so DuckDB predicts the exact
 * extraction output from first principles (title/h1/list lines are pure
 * column concats; the body line is the whitespace-collapsed original
 * text, since escape -> wrap -> extract round-trips any text). The
 * pipeline oracle then replays the SAME C4 line rules and Gopher metric
 * fragments every existing text oracle uses ([[TextQueries]] shares
 * them), so a threshold change propagates instead of drifting.
 *
 * 100 TB shape: extraction is a per-row linear scan fused into the scan
 * stage (native expression, no shuffle); C4/Gopher are row-local too —
 * the whole flagship runs shuffle-free until a downstream consumer
 * aggregates.
 */
object WebQueries extends QueryProvider {

  /** documents wrapped in a rich synthetic page: DOCTYPE, head with
   *  title/script/style, comment, attribute containing '>', h1 with a
   *  named entity, escaped body text, list items (one via a numeric
   *  entity), nbsp + inline tags in the tail. Exercises every tokenizer
   *  branch on driver data. */
  private def htmlDocs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").withColumn("html", concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), col("doc_id"),
      lit("</title><script type=\"text/javascript\">var x = '<p>not text</p>';</script>"),
      lit("<style>p { color: red; }</style></head>"),
      lit("<body data-note=\"a > b\"><!-- hidden <p>comment</p> -->"),
      lit("<h1 class=\"t\">Doc "), col("doc_id"), lit(" &amp; "), col("lang"),
      lit("</h1><p>"),
      expr("replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"),
      lit("</p><ul><li>src "), col("source"),
      lit("</li><li>chars &#"), (col("n_chars") % 10 + 48).cast("string"),
      lit(";"), col("n_chars").cast("string"),
      lit("</li></ul><div>tail <b>bold</b>&nbsp;end</div></body></html>")))

  private def htmlExtract(s: SparkSession, dir: String): DataFrame =
    htmlDocs(s, dir).select(col("doc_id"),
      HtmlText.extract(col("html")).as("extracted"))

  /** The exact extraction output, predicted in SQL: six lines — title,
   *  h1, collapsed body text, two list items, tail. */
  private val expectedExtractSql =
    """'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' & ' || lang || chr(10) ||
      |    regexp_replace(trim(text), ' +', ' ', 'g') || chr(10) ||
      |    'src ' || source || chr(10) ||
      |    'chars ' || CAST(n_chars % 10 AS VARCHAR) || CAST(n_chars AS VARCHAR) || chr(10) ||
      |    'tail bold end'""".stripMargin

  private val htmlExtractSql =
    s"""SELECT doc_id,
      |  $expectedExtractSql AS extracted
      |FROM documents""".stripMargin

  /** Flagship: extract -> C4 line rules -> Gopher quality, the front
   *  half of a C4/RefinedWeb-style curation chain, over the extracted
   *  (multi-line) text. minLineWords=3 keeps the h1/body/tail lines and
   *  drops the short title/src/chars lines. */
  private def webExtract(s: SparkSession, dir: String): DataFrame = {
    val extracted = htmlDocs(s, dir).select(col("doc_id"),
      HtmlText.extract(col("html")).as("text"))
    val cleaned = C4Clean.clean(extracted, "text", "doc_id",
        minLineWords = 3, minKeptLines = 3, requireTerminalPunct = false)
      .where(col("c4_pass"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("clean_text"))
    TextAnalysis.gopherRules(cleaned, "clean_text", "doc_id",
        keep = Seq("n_lines", "n_kept"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("n_words"),
        col("mean_word_len"), col("alpha_ratio"), col("n_stop"),
        col("gopher_pass"))
  }

  private val webExtractSql =
    s"""WITH ext AS (
      |  SELECT doc_id,
      |  $expectedExtractSql AS text
      |  FROM documents
      |), ln AS (
      |  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM ext
      |), k AS (
      |  SELECT doc_id, lines,
      |    list_filter(lines, l -> len(string_split(trim(l), ' ')) >= 3
      |      AND trim(l) <> '' AND NOT contains(lower(l), 'javascript')) AS kept,
      |    (NOT contains(lower(text), 'lorem ipsum')
      |      AND NOT contains(text, '{')) AS page_ok
      |  FROM ln
      |), c AS (
      |  SELECT doc_id,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(kept) AS BIGINT) AS n_kept,
      |    array_to_string(kept, chr(10)) AS clean_text
      |  FROM k
      |  WHERE len(kept) >= 3 AND page_ok
      |), w AS (
      |  SELECT doc_id, n_lines, n_kept, clean_text AS text,
      |    string_split(clean_text, ' ') AS ws
      |  FROM c
      |), m AS (
      |  SELECT doc_id, n_lines, n_kept,
      |${TextQueries.gopherMetricsSql}
      |  FROM w
      |)
      |SELECT doc_id, n_lines, n_kept, n_words, mean_word_len, alpha_ratio,
      |  n_stop,
      |  ${TextQueries.gopherPassSql} AS gopher_pass
      |FROM m""".stripMargin

  /** STRUCTURED TABLE MINING — the complement of linear extraction:
   *  each document carries a 3-row header+data `<table>` built from its
   *  columns (with an entity and an inline tag inside cells, a th/td
   *  mix, and a trailing unclosed cell exercising the implicit-close
   *  rule), and `Html.tables` explodes it to (table, row, cells) rows
   *  the oracle predicts cell-for-cell. */
  private def htmlTables(s: SparkSession, dir: String): DataFrame = {
    val pages = T(s, dir, "documents").withColumn("html", concat(
      lit("<html><body><h1>doc</h1><table><tr><th>k</th><th>v</th></tr>"),
      lit("<tr><td><b>lang</b></td><td>"), col("lang"), lit("</td></tr>"),
      lit("<tr><td>src &amp; "), col("doc_id"),
      lit("</td><td>"), col("source"), lit("</table></body></html>")))
      .select(col("doc_id"), col("html"))
    graft.operators.Html.tables(pages, "html")
      .select(col("doc_id"), col("table_idx"), col("row_idx"),
        col("n_cells"), array_join(col("cells"), "|").as("cells"))
  }

  private val htmlTablesSql =
    """SELECT doc_id, CAST(0 AS INTEGER) AS table_idx,
      |  CAST(r.fi AS INTEGER) AS row_idx, CAST(2 AS BIGINT) AS n_cells,
      |  CASE r.fi
      |    WHEN 0 THEN 'k|v'
      |    WHEN 1 THEN 'lang|' || lang
      |    ELSE 'src & ' || CAST(doc_id AS VARCHAR) || '|' || source
      |  END AS cells
      |FROM documents, (VALUES (0), (1), (2)) r(fi)""".stripMargin

  /** CRAWL-BYTES INGEST — the true stage zero: each page is wrapped in
   *  a real .warc.gz (Common Crawl layout: warcinfo/request/response
   *  records, one gzip member each — `Warc.withWarcGzPayload`), then
   *  `Warc.records` walks the archive (multi-member gunzip, WARC header
   *  + Content-Length framing, HTTP response split) and the response
   *  body feeds the SAME `HtmlText.extract` as `text_html_extract`.
   *  The oracle predicts record inventory, HTTP metadata and the exact
   *  extraction output from first principles — a framing slip loses or
   *  corrupts a record, an HTTP-split slip shifts the body. */
  private def warcExtract(s: SparkSession, dir: String): DataFrame = {
    val pages = htmlDocs(s, dir).select(col("doc_id"), col("html"),
      concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"))
    graft.operators.Warc.records(
        graft.operators.Warc.withWarcGzPayload(pages, "html", "uri")
          .drop("html", "uri"),
        "payload")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_records"),
        array_join(sort_array(collect_list(col("warc_type"))), ",")
          .as("record_types"),
        max(when(col("warc_type") === "response", col("target_uri")))
          .as("target_uri"),
        max(when(col("warc_type") === "response", col("http_status")))
          .as("http_status"),
        max(when(col("warc_type") === "response", col("content_type")))
          .as("content_type"),
        max(when(col("warc_type") === "response",
          HtmlText.extract(col("body")))).as("extracted"))
  }

  private val warcExtractSql =
    s"""SELECT doc_id, CAST(3 AS BIGINT) AS n_records,
      |  'request,response,warcinfo' AS record_types,
      |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  CAST(200 AS INTEGER) AS http_status,
      |  'text/html; charset=UTF-8' AS content_type,
      |  $expectedExtractSql AS extracted
      |FROM documents""".stripMargin

  /** CHARSET + CHUNKED TRANSFER DECODE — the wire-reality tier of the
   *  WARC walk: each document rides a real .warc.gz response whose
   *  HTTP body exercises one of four decode paths by doc parity —
   *  (0) Content-Length + charset=utf-8 parameter, (1) windows-1252
   *  BYTES labeled iso-8859-1 in Content-Type (certifying the WHATWG
   *  latin-1→cp1252 mapping on a euro-sign byte 0x80), (2) cp1252
   *  declared ONLY via `<meta charset>` in the body prescan window,
   *  (3) `Transfer-Encoding: chunked` UTF-8 with 7-byte chunks (so
   *  multi-byte sequences split across chunk boundaries) + an
   *  http-equiv meta declaration, a chunk extension and a trailer
   *  field. The oracle predicts the exact transcoded text from
   *  document columns (chr() code points keep the source ASCII) — a
   *  dechunk slip shifts bytes, a charset slip mojibakes them.
   *  100 TB shape: identical to `io_warc_extract` — per-payload
   *  linear decode, archive blobs never shuffle. */
  private def warcCharset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cp1252 = "windows-1252"
    val archives = T(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, source, lang) =>
        val mode = (id % 4).toInt
        val uri = s"https://example.com/doc/$id"
        val (ctype, bytes, chunk) = mode match {
          case 0 => ("text/plain; charset=utf-8",
            s"plain $source doc $id.".getBytes(UTF_8), 0)
          case 1 => ("text/plain; charset=iso-8859-1",
            // \u escapes keep the source ASCII: e-acute, euro, a-grave
            ("Caf\u00e9 \u20ac" + lang + " d\u00e9j\u00e0")
              .getBytes(cp1252), 0)
          case 2 => ("text/html",
            ("<html><head><meta charset=\"windows-1252\"></head><body>" +
              "\u2122" + source + "\u2122 na\u00efve</body></html>")
              .getBytes(cp1252), 0)
          case _ => ("text/html",
            ("<html><head><meta http-equiv=\"Content-Type\" " +
              "content=\"text/html; charset=utf-8\"></head><body>" +
              "h\u00e9llo \u2014 " + lang + " #" + id + "</body></html>")
              .getBytes(UTF_8), 7)
        }
        val payload = graft.operators.Warc.encodeWarcGz(Seq((Seq(
          "WARC-Type" -> "response", "WARC-Target-URI" -> uri,
          "WARC-Date" -> "2026-01-01T00:00:00Z"),
          graft.operators.Warc.httpResponseBytes(bytes, ctype, chunk))))
        (id, mode.toLong, payload)
      }.toDF("doc_id", "mode", "payload")
    graft.operators.Warc.records(archives, "payload")
      .select(col("doc_id"), col("mode"), col("http_status"),
        col("content_type"), col("body").as("text"))
  }

  private val warcCharsetSql =
    """SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS mode,
      |  CAST(200 AS INTEGER) AS http_status,
      |  CASE doc_id % 4
      |    WHEN 0 THEN 'text/plain; charset=utf-8'
      |    WHEN 1 THEN 'text/plain; charset=iso-8859-1'
      |    ELSE 'text/html' END AS content_type,
      |  CASE doc_id % 4
      |    WHEN 0 THEN 'plain ' || source || ' doc '
      |      || CAST(doc_id AS VARCHAR) || '.'
      |    WHEN 1 THEN 'Caf' || chr(233) || ' ' || chr(8364) || lang
      |      || ' d' || chr(233) || 'j' || chr(224)
      |    WHEN 2 THEN '<html><head><meta charset="windows-1252"></head><body>'
      |      || chr(8482) || source || chr(8482) || ' na' || chr(239)
      |      || 've</body></html>'
      |    ELSE '<html><head><meta http-equiv="Content-Type" '
      |      || 'content="text/html; charset=utf-8"></head><body>h'
      |      || chr(233) || 'llo ' || chr(8212) || ' ' || lang || ' #'
      |      || CAST(doc_id AS VARCHAR) || '</body></html>'
      |  END AS text
      |FROM documents""".stripMargin

  /** REVISIT-RECORD WALK — the WARC 1.1 identical-payload-digest
   *  profile (how real crawls store an unchanged re-fetch: headers
   *  only, digest + refers-to pointing at the original capture). Each
   *  document rides one archive with a full response plus
   *  `doc_id % 3` revisit records through the real writer
   *  ([[graft.operators.Warc.withRevisitGzPayload]]); the walk
   *  ([[graft.operators.Warc.revisitRecords]]) must keep both record
   *  types, carry the digest/refers headers, and give revisits empty
   *  bodies. The oracle recomputes the DIGEST VALUE itself
   *  (`md5(text)` cross-engine) plus every count and length from
   *  document columns — a digest slip, a dropped revisit, or body
   *  bytes leaking into a revisit all hash-fail. 100 TB shape:
   *  per-payload linear decode, blobs dropped pre-shuffle, one
   *  doc_id-keyed aggregate. */
  private def warcRevisit(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents").select(
      col("doc_id"), col("text"),
      concat(lit("https://h"), col("doc_id") % 5,
        lit(".example.com/doc/"), col("doc_id")).as("uri"),
      (col("doc_id") % 3 + 1).cast("int").as("captures"))
    val walk = graft.operators.Warc.revisitRecords(
      graft.operators.Warc.withRevisitGzPayload(
        docs, "text", "uri", "captures").drop("text", "uri", "captures"),
      "payload")
    walk.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_captures"),
      sum(when(col("warc_type") === "response", 1L).otherwise(0L))
        .as("n_responses"),
      sum(when(col("warc_type") === "revisit", 1L).otherwise(0L))
        .as("n_revisits"),
      countDistinct(col("payload_digest")).as("n_digests"),
      max(col("payload_digest")).as("digest"),
      coalesce(max(when(col("warc_type") === "revisit",
        col("refers_to_uri"))), lit("")).as("revisit_refers"),
      sum(col("body_len")).as("stored_len"),
      max(when(col("warc_type") === "response", col("body")))
        .as("body_text"))
  }

  private val warcRevisitSql =
    """SELECT doc_id,
      |  CAST(1 + doc_id % 3 AS BIGINT) AS n_captures,
      |  CAST(1 AS BIGINT) AS n_responses,
      |  CAST(doc_id % 3 AS BIGINT) AS n_revisits,
      |  CAST(1 AS BIGINT) AS n_digests,
      |  'md5:' || md5(text) AS digest,
      |  CASE WHEN doc_id % 3 > 0
      |    THEN 'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |      || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
      |    ELSE '' END AS revisit_refers,
      |  CAST(strlen(text) AS BIGINT) AS stored_len,
      |  text AS body_text
      |FROM documents""".stripMargin

  /** CRAWL STORAGE-DEDUP ACCOUNTING — the flagship consumer of the
   *  revisit profile: group captures on (host, payload_digest) — the
   *  digest GROUPING is the identical-payload-digest join, with no
   *  actual join in the plan — resolve each digest's body length from
   *  its response capture, then roll up per host: fetches, revisits,
   *  stored vs saved bytes and the savings rate in integer ppm. This
   *  is the accounting a crawl operator runs to size dedup wins.
   *  Cross-HOST duplicate attribution is deliberately out of scope
   *  here (that is the `Dedup.*Against` family's job — it needs a
   *  digest-dimension shuffle this single-pass shape avoids).
   *  100 TB shape: two-level aggregate — map-side partials into a
   *  (host, digest)-keyed exchange (36-byte digests, no bodies), then
   *  a host-keyed rollup; nothing corpus-quadratic, no join. */
  private def crawlRevisit(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents").select(
      col("doc_id"), col("text"),
      concat(lit("https://h"), col("doc_id") % 5,
        lit(".example.com/doc/"), col("doc_id")).as("uri"),
      (col("doc_id") % 3 + 1).cast("int").as("captures"))
    val walk = graft.operators.Warc.revisitRecords(
      graft.operators.Warc.withRevisitGzPayload(
        docs, "text", "uri", "captures").drop("text", "uri", "captures"),
      "payload")
      .select(
        regexp_extract(col("target_uri"), "https://([^/]+)/", 1).as("host"),
        col("warc_type"), col("payload_digest"), col("body_len"))
    val perDigest = walk
      .groupBy(col("host"), col("payload_digest"))
      .agg(
        sum(when(col("warc_type") === "response", 1L).otherwise(0L))
          .as("n_resp"),
        sum(when(col("warc_type") === "revisit", 1L).otherwise(0L))
          .as("n_rev"),
        max(when(col("warc_type") === "response", col("body_len")))
          .as("len"))
    perDigest.groupBy(col("host")).agg(
      sum(col("n_resp") + col("n_rev")).as("n_fetches"),
      sum(col("n_rev")).as("n_revisits"),
      sum(col("n_resp") * col("len")).as("stored_bytes"),
      sum(col("n_rev") * col("len")).as("saved_bytes"))
      .withColumn("saved_ppm",
        expr("saved_bytes * 1000000L div (stored_bytes + saved_bytes)"))
  }

  private val crawlRevisitSql =
    """WITH per_doc AS (
      |  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host,
      |    1 + doc_id % 3 AS caps, doc_id % 3 AS revs,
      |    strlen(text) AS len
      |  FROM documents)
      |SELECT host,
      |  CAST(sum(caps) AS BIGINT) AS n_fetches,
      |  CAST(sum(revs) AS BIGINT) AS n_revisits,
      |  CAST(sum(len) AS BIGINT) AS stored_bytes,
      |  CAST(sum(revs * len) AS BIGINT) AS saved_bytes,
      |  CAST(sum(revs * len) * 1000000 //
      |    (sum(len) + sum(revs * len)) AS BIGINT) AS saved_ppm
      |FROM per_doc GROUP BY host""".stripMargin

  /** CRAWL-OPS DASHBOARD — the per-host view a crawl operator actually
   *  reads: REVISIT dedup savings (the `pipeline_crawl_revisit`
   *  accounting, unchanged) joined with RECRAWL staleness (the
   *  `Recrawl` classes over a host-aligned fixture) — storage wins on
   *  one side, freshness debt and the next recrawl pick on the other,
   *  one row per host. Both sides already have exact closed forms; the
   *  composition certifies they agree on the HOST DIMENSION (a key
   *  drift between operator families would null out the join).
   *  100 TB shape: two host-bounded aggregates joined on the host
   *  dimension — rows ≈ |hosts|, never corpus-shaped; no hints, AQE
   *  sizes the join. */
  private def crawlOps(s: SparkSession, dir: String): DataFrame = {
    val acct = crawlRevisit(s, dir)
    val base = T(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://h"), col("doc_id") % 5,
        lit(".example.com/p/"), col("doc_id")).as("url"))
    val declared = base.filter(col("doc_id") % 5 =!= 4)
      .select(col("url"),
        (lit(1000000L) + col("doc_id") * 50L).as("lastmod_ms"))
    val fetched = base.filter(col("doc_id") % 3 =!= 0)
      .select(col("url"),
        (lit(1000000L) + col("doc_id") * 50L +
          when(col("doc_id") % 2 === 0, -25L).otherwise(25L))
          .as("fetch_ms"))
    val plan = graft.operators.Recrawl.plan(
      graft.operators.Recrawl.staleness(
        declared, "url", "lastmod_ms", fetched, "fetch_ms"))
    acct.join(plan, Seq("host"))
      .select(col("host"), col("n_fetches"), col("n_revisits"),
        col("saved_ppm"), col("n_urls"), col("n_new"), col("n_stale"),
        col("recrawl_url"))
  }

  private val crawlOpsSql =
    """WITH per_doc AS (
      |  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host,
      |    1 + doc_id % 3 AS caps, doc_id % 3 AS revs,
      |    strlen(text) AS len
      |  FROM documents),
      |acct AS (
      |  SELECT host,
      |    CAST(sum(caps) AS BIGINT) AS n_fetches,
      |    CAST(sum(revs) AS BIGINT) AS n_revisits,
      |    CAST(sum(revs * len) * 1000000 //
      |      (sum(len) + sum(revs * len)) AS BIGINT) AS saved_ppm
      |  FROM per_doc GROUP BY host),
      |u AS (
      |  SELECT doc_id,
      |    'https://h' || CAST(doc_id % 5 AS VARCHAR)
      |      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
      |    'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host,
      |    CASE WHEN doc_id % 5 <> 4
      |      THEN 1000000 + doc_id * 50 ELSE -1 END AS lm,
      |    CASE WHEN doc_id % 3 <> 0
      |      THEN 1000000 + doc_id * 50
      |        + CASE WHEN doc_id % 2 = 0 THEN -25 ELSE 25 END
      |      ELSE -1 END AS ft
      |  FROM documents
      |  WHERE doc_id % 5 <> 4 OR doc_id % 3 <> 0),
      |cls AS (
      |  SELECT *,
      |    CASE WHEN ft < 0 THEN 'new' WHEN lm < 0 THEN 'undeclared'
      |      WHEN lm > ft THEN 'stale' ELSE 'fresh' END AS status,
      |    CASE WHEN ft < 0 THEN lm
      |      WHEN lm > ft THEN lm - ft ELSE 0 END AS overdue
      |  FROM u),
      |pick AS (
      |  SELECT host, url, overdue,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY overdue DESC, url DESC) AS rn
      |  FROM cls WHERE overdue > 0),
      |plan AS (
      |  SELECT c.host, c.n_urls, c.n_new, c.n_stale,
      |    coalesce(p.url, '') AS recrawl_url
      |  FROM (
      |    SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
      |      CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
      |        AS BIGINT) AS n_new,
      |      CAST(sum(CASE WHEN status = 'stale' THEN 1 ELSE 0 END)
      |        AS BIGINT) AS n_stale
      |    FROM cls GROUP BY host) c
      |  LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p ON c.host = p.host)
      |SELECT acct.host, acct.n_fetches, acct.n_revisits, acct.saved_ppm,
      |  plan.n_urls, plan.n_new, plan.n_stale, plan.recrawl_url
      |FROM acct JOIN plan ON acct.host = plan.host""".stripMargin

  /** ZIPNUM SECONDARY INDEX — the missing level of the CDX family:
   *  Common Crawl serves its index as gzip-blocked cdx shards plus a
   *  tiny cluster.idx of (first-key, offset, length) per block, and
   *  consumers BINARY-SEARCH the idx then decompress ONE ~3000-line
   *  block instead of the shard. Each 16-doc group packs its
   *  SURT-sorted cdxj lines 4 per block ([[graft.operators.Warc
   *  .encodeZipnum]]); every third doc then looks itself up
   *  ([[graft.operators.Warc.zipnumLookup]]) and the row asserts the
   *  lookup touched EXACTLY one block's compressed bytes — the oracle
   *  expects single_block = true for every probe, so a lookup that
   *  degrades to a shard scan hash-fails, not just slows down. mime
   *  comes from the matched line's json, n_blocks from the shard
   *  geometry. 100 TB shape: the whole point — random access reads
   *  O(block), not O(shard); per-group work is partition-local. */
  private def cdxZipnum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("lang"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val W = graft.operators.Warc
        val ds = it.toSeq
        val lines = ds.map { case (_, id, lang) =>
          val url = s"https://example.com/doc/$id"
          W.cdxjLine(url, (20260101000000L + id).toString, Seq(
            "url" -> url,
            "mime" -> (if (id % 2 == 0) "text/html" else "text/plain"),
            "lang" -> lang))
        }.sorted
        val (blob, idx) = W.encodeZipnum(lines, perBlock = 4)
        val mimeRe = "\"mime\":\"([^\"]+)\"".r
        ds.filter(_._2 % 3 == 0).map { case (_, id, _) =>
          val key = W.surt(s"https://example.com/doc/$id")
          val (hits, read, blocksRead) = W.zipnumLookup(blob, idx, key)
          val mime = hits.headOption
            .flatMap(h => mimeRe.findFirstMatchIn(h).map(_.group(1)))
            .getOrElse("")
          (id, hits.size.toLong, mime, blocksRead.toLong,
            read < blob.length, idx.size.toLong)
        }
      }
      .toDF("doc_id", "n_found", "mime", "blocks_read", "partial_read",
        "n_blocks")
  }

  // blocks_read is EXACT cross-engine: 1 unless the key is its block's
  // FIRST line (sorted rank ≡ 1 mod 4, rank > 1), where the backward
  // straddle step honestly costs a second block. The oracle replays
  // the SURT sort rank; partial_read pins that a lookup never touches
  // the whole shard (except the degenerate one-block tail shard).
  private val cdxZipnumSql =
    """WITH ranked AS (
      |  SELECT doc_id,
      |    row_number() OVER (PARTITION BY doc_id // 16
      |      ORDER BY 'com,example)/doc/' || CAST(doc_id AS VARCHAR)) AS rn,
      |    count(*) OVER (PARTITION BY doc_id // 16) AS cnt
      |  FROM documents)
      |SELECT doc_id, CAST(1 AS BIGINT) AS n_found,
      |  CASE WHEN doc_id % 2 = 0 THEN 'text/html'
      |    ELSE 'text/plain' END AS mime,
      |  CAST(CASE WHEN rn > 1 AND (rn - 1) % 4 = 0 THEN 2
      |    ELSE 1 END AS BIGINT) AS blocks_read,
      |  (cnt + 3) // 4 > CASE WHEN rn > 1 AND (rn - 1) % 4 = 0 THEN 2
      |    ELSE 1 END AS partial_read,
      |  CAST((cnt + 3) // 4 AS BIGINT) AS n_blocks
      |FROM ranked WHERE doc_id % 3 = 0""".stripMargin

  /** ZIPNUM→ARCHIVE RANDOM ACCESS — the COMPLETE Common Crawl consumer
   *  path in one plan: archives written record-per-member with a real
   *  byte index (`encodeWarcGzIndexed`), cdxj lines carrying those
   *  offsets, the lines zipnum-packed behind a cluster.idx, then every
   *  third doc resolved END-TO-END — binary-search the cluster.idx,
   *  gunzip one cdx block, parse the hit's offset/length json, slice
   *  EXACTLY that member out of the archive (`recordsAt`) and decode
   *  its HTTP body. The oracle predicts the final body text from
   *  document columns, so a slip at ANY of the four levels (idx
   *  search, block decode, json offsets, member framing) hash-fails.
   *  100 TB shape: this is the anti-scan path — per probe the engine
   *  touches O(cdx block) + O(one record), never O(shard); per-group
   *  work is partition-local, the slim probe rows are all that move. */
  private def zipnumFetch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val date = "2026-01-01T00:00:00Z"
    T(s, dir, "documents")
      .select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("source"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val W = graft.operators.Warc
        val ds = it.toSeq.sortBy(_._2)
        val recs = (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date) ->
          "software: graft\r\n".getBytes(UTF_8)) +:
          ds.map { case (_, id, source) =>
            Seq("WARC-Type" -> "response",
              "WARC-Target-URI" -> s"https://example.com/doc/$id",
              "WARC-Date" -> date) ->
              W.httpResponseBytes(
                s"zipnum body of doc $id by $source".getBytes(UTF_8),
                "text/plain; charset=utf-8")
          }
        val (blob, memberIdx) = W.encodeWarcGzIndexed(recs)
        val lines = ds.zip(memberIdx.drop(1)).map {
          case ((_, id, _), (off, len)) =>
            val url = s"https://example.com/doc/$id"
            W.cdxjLine(url, (20260101000000L + id).toString, Seq(
              "url" -> url, "offset" -> off.toString,
              "length" -> len.toString))
        }.sorted
        val (cdxBlob, clusterIdx) = W.encodeZipnum(lines, perBlock = 4)
        val offRe = "\"offset\":\"(\\d+)\"".r
        val lenRe = "\"length\":\"(\\d+)\"".r
        // ONE output row per shard: the blob rides once, every probe's
        // (offset, length) pick rides beside it (the cdxFetch shape —
        // a 100 TB caller must never replicate archive bytes per probe)
        val picks = ds.filter(_._2 % 3 == 1).map { case (_, id, _) =>
          val key = W.surt(s"https://example.com/doc/$id")
          val (hits, _, _) = W.zipnumLookup(cdxBlob, clusterIdx, key)
          require(hits.size == 1, s"zipnum probe for doc $id: ${hits.size}")
          (offRe.findFirstMatchIn(hits.head).get.group(1).toLong,
            lenRe.findFirstMatchIn(hits.head).get.group(1).toLong)
        }.sorted
        if (picks.isEmpty) Iterator.empty else Iterator((blob, picks))
      }
      .toDF("payload", "picks_raw")
      .withColumn("picks", expr(
        "transform(picks_raw, p -> struct(p._1 as offset, p._2 as length))"))
      .drop("picks_raw")
      .transform(df => graft.operators.Warc.recordsAt(df, "payload", "picks"))
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("target_uri"), col("http_status"), col("body").as("text"))
  }

  private val zipnumFetchSql =
    """SELECT doc_id,
      |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR)
      |    AS target_uri,
      |  CAST(200 AS INTEGER) AS http_status,
      |  'zipnum body of doc ' || CAST(doc_id AS VARCHAR) || ' by '
      |    || source AS text
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin

  /** RECRAWL PLANNING — the step that closes the crawl lifecycle:
   *  sitemap `lastmod` declarations full-outer-joined with the fetch
   *  log ([[graft.operators.Recrawl.staleness]]) classify every url
   *  as new / stale / fresh / undeclared, and
   *  [[graft.operators.Recrawl.plan]] rolls up per host with a
   *  deterministic most-overdue candidate pick (max_by on
   *  (overdue, url) — no window). Fixture: declarations and fetches
   *  derive from doc arithmetic so every class is populated and the
   *  oracle replays the join, the classes, AND the pick tiebreak with
   *  a row_number. 100 TB shape: one url-keyed full-outer join of two
   *  slim one-row-per-url tables + one host-keyed aggregate with
   *  map-side partials. */
  private def recrawlPlan(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://h"), col("doc_id") % 7,
        lit(".example.com/p/"), col("doc_id")).as("url"))
    val declared = base.filter(col("doc_id") % 5 =!= 4)
      .select(col("url"),
        (lit(1000000L) + col("doc_id") * 50L).as("lastmod_ms"))
    val fetched = base.filter(col("doc_id") % 3 =!= 0)
      .select(col("url"),
        (lit(1000000L) + col("doc_id") * 50L +
          when(col("doc_id") % 2 === 0, -25L).otherwise(25L))
          .as("fetch_ms"))
    graft.operators.Recrawl.plan(
      graft.operators.Recrawl.staleness(
        declared, "url", "lastmod_ms", fetched, "fetch_ms"))
  }

  private val recrawlPlanSql =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://h' || CAST(doc_id % 7 AS VARCHAR)
      |      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
      |    'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
      |    CASE WHEN doc_id % 5 <> 4
      |      THEN 1000000 + doc_id * 50 ELSE -1 END AS lm,
      |    CASE WHEN doc_id % 3 <> 0
      |      THEN 1000000 + doc_id * 50
      |        + CASE WHEN doc_id % 2 = 0 THEN -25 ELSE 25 END
      |      ELSE -1 END AS ft
      |  FROM documents
      |  WHERE doc_id % 5 <> 4 OR doc_id % 3 <> 0),
      |cls AS (
      |  SELECT *,
      |    CASE WHEN ft < 0 THEN 'new' WHEN lm < 0 THEN 'undeclared'
      |      WHEN lm > ft THEN 'stale' ELSE 'fresh' END AS status,
      |    CASE WHEN ft < 0 THEN lm
      |      WHEN lm > ft THEN lm - ft ELSE 0 END AS overdue
      |  FROM u),
      |pick AS (
      |  SELECT host, url, overdue,
      |    row_number() OVER (PARTITION BY host
      |      ORDER BY overdue DESC, url DESC) AS rn
      |  FROM cls WHERE overdue > 0)
      |SELECT c.host, c.n_urls, c.n_new, c.n_stale, c.n_fresh,
      |  c.n_undeclared,
      |  coalesce(p.url, '') AS recrawl_url,
      |  CAST(coalesce(p.overdue, 0) AS BIGINT) AS recrawl_overdue_ms
      |FROM (
      |  SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
      |    CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(sum(CASE WHEN status = 'stale' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_stale,
      |    CAST(sum(CASE WHEN status = 'fresh' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_fresh,
      |    CAST(sum(CASE WHEN status = 'undeclared' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_undeclared
      |  FROM cls GROUP BY host) c
      |LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p ON c.host = p.host"""
      .stripMargin

  /** REDIRECT-CHAIN RESOLUTION — collapse a crawl's 3xx Location edges
   *  to final landing urls with loop detection
   *  ([[graft.operators.Redirects.resolve]], pointer doubling: 4
   *  self-join rounds for the 16-hop budget instead of 16). Fixture
   *  edges derive from doc ids — descending chains of length 1–7 into
   *  each 8-aligned terminal, with every 64-aligned block's residue-3
   *  url a SELF-LOOP so residues 3–7 feed a genuine redirect trap —
   *  which gives the oracle a CLOSED FORM (no recursion): unresolved
   *  iff doc_id % 64 in 3..7, else final = doc_id - doc_id % 8 with
   *  hops = doc_id % 8. A doubling slip (hop miscount, premature
   *  freeze, loop leak) breaks the hash. 100 TB shape: see the
   *  operator — log-bounded url-keyed self-joins over one slim row per
   *  redirect source, localCheckpoint per round. */
  private def redirectResolve(s: SparkSession, dir: String): DataFrame = {
    val u = (c: org.apache.spark.sql.Column) =>
      concat(lit("https://r.example.com/u/"), c)
    val edges = T(s, dir, "documents")
      .select(col("doc_id"))
      .filter(col("doc_id") % 8 =!= 0)
      .select(
        u(col("doc_id")).as("src"),
        u(when(col("doc_id") % 64 === 3, col("doc_id"))
          .otherwise(col("doc_id") - 1)).as("dst"))
    graft.operators.Redirects.resolve(edges, maxHops = 16)
  }

  private val redirectResolveSql =
    """SELECT 'https://r.example.com/u/' || CAST(doc_id AS VARCHAR) AS src,
      |  CASE WHEN doc_id % 64 IN (3, 4, 5, 6, 7) THEN ''
      |    ELSE 'https://r.example.com/u/'
      |      || CAST(doc_id - doc_id % 8 AS VARCHAR) END AS final_url,
      |  CAST(CASE WHEN doc_id % 64 IN (3, 4, 5, 6, 7) THEN -1
      |    ELSE doc_id % 8 END AS BIGINT) AS hops,
      |  doc_id % 64 NOT IN (3, 4, 5, 6, 7) AS resolved
      |FROM documents WHERE doc_id % 8 <> 0""".stripMargin

  /** CDX(J) SIDECAR WALK — the third Common Crawl sidecar (WET/WAT
   *  landed in r15): per-record index lines (SURT url key, 14-digit
   *  timestamp, a JSON block with url/mime/status/digest/offset/
   *  length/filename). Each document writes a two-line cdxj fixture
   *  through the real writer ([[graft.operators.Warc.surt]] +
   *  `cdxjLine` — so SURT lowering, www-strip, label reversal and the
   *  string-valued JSON convention are all exercised) plus a `!meta`
   *  comment line the walk must drop; [[graft.operators.Warc
   *  .cdxjRecords]] re-parses it Catalyst-side and `get_json_object`
   *  pulls the fields. The oracle predicts every column from document
   *  columns. 100 TB shape: slim-text 1:N explode, no shuffle. */
  private def cdxExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sidecars = T(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)]
      .map { case (id, lang) =>
        val url = s"https://www.Example.com/Doc/$id?lang=$lang"
        val W = graft.operators.Warc
        val l1 = W.cdxjLine(url, (20260101000000L + id).toString, Seq(
          "url" -> url,
          "mime" -> (if (id % 2 == 0) "text/html" else "text/plain"),
          "status" -> (if (id % 3 == 0) "200" else "404"),
          "digest" -> s"sha1:G$id",
          "length" -> (1000 + id).toString,
          "offset" -> (13 * id).toString,
          "filename" -> s"crawl-${id % 10}.warc.gz"))
        val l2 = W.cdxjLine(url, (20260101000000L + id + 1).toString, Seq(
          "url" -> url, "mime" -> "warc/revisit", "status" -> "-",
          "digest" -> s"sha1:G$id",
          "length" -> (1000 + id + 7).toString,
          "offset" -> (13 * id + 7).toString,
          "filename" -> s"crawl-${(id + 1) % 10}.warc.gz"))
        (id, s"!meta: graft cdxj fixture\n$l1\n$l2\n")
      }.toDF("doc_id", "cdx")
    graft.operators.Warc.cdxjRecords(sidecars, "cdx")
      .select(col("doc_id"), col("cdx_seq"), col("urlkey"),
        col("cdx_ts").cast("long").as("cdx_ts"),
        get_json_object(col("json"), "$['url']").as("url"),
        get_json_object(col("json"), "$['mime']").as("mime"),
        get_json_object(col("json"), "$['status']").as("status"),
        get_json_object(col("json"), "$['digest']").as("digest"),
        get_json_object(col("json"), "$['offset']").cast("long")
          .as("cdx_offset"),
        get_json_object(col("json"), "$['length']").cast("long")
          .as("cdx_length"),
        get_json_object(col("json"), "$['filename']").as("filename"))
  }

  private val cdxExtractSql =
    """SELECT doc_id, CAST(r.fi AS INTEGER) AS cdx_seq,
      |  'com,example)/doc/' || CAST(doc_id AS VARCHAR) || '?lang=' || lang
      |    AS urlkey,
      |  CAST(20260101000000 + doc_id + (r.fi - 1) AS BIGINT) AS cdx_ts,
      |  'https://www.Example.com/Doc/' || CAST(doc_id AS VARCHAR)
      |    || '?lang=' || lang AS url,
      |  CASE WHEN r.fi = 2 THEN 'warc/revisit'
      |       WHEN doc_id % 2 = 0 THEN 'text/html'
      |       ELSE 'text/plain' END AS mime,
      |  CASE WHEN r.fi = 2 THEN '-'
      |       WHEN doc_id % 3 = 0 THEN '200' ELSE '404' END AS status,
      |  'sha1:G' || CAST(doc_id AS VARCHAR) AS digest,
      |  CAST(13 * doc_id + CASE WHEN r.fi = 2 THEN 7 ELSE 0 END AS BIGINT)
      |    AS cdx_offset,
      |  CAST(1000 + doc_id + CASE WHEN r.fi = 2 THEN 7 ELSE 0 END AS BIGINT)
      |    AS cdx_length,
      |  'crawl-' || CAST((doc_id + r.fi - 1) % 10 AS VARCHAR) || '.warc.gz'
      |    AS filename
      |FROM documents, (VALUES (1), (2)) r(fi)""".stripMargin

  /** CDX OFFSET-SEEK FETCH FLAGSHIP — the random-access path real
   *  crawl consumers use instead of full scans: multi-page archives
   *  (8 docs each: a warcinfo leader + one response member per doc)
   *  are encoded WITH their per-member byte index
   *  (`encodeWarcGzIndexed`), the cdxj sidecar carries the REAL
   *  offsets, and the consumer side then (1) walks the index
   *  Catalyst-side, (2) filters picks on an index field (mime =
   *  text/html — even docs), (3) aggregates picks per archive and
   *  joins them to the archive blobs once, and (4) `recordsAt`
   *  range-decodes ONLY the selected members. A wrong offset/length
   *  desyncs gzip or frames the wrong record and the oracle's
   *  predicted uri/body goes red. 100 TB shape: the pick side is slim
   *  index text; the blob side is scanned once and never shuffles
   *  after the single picks join (in production the join becomes a
   *  range-read per pick against the archive store — same dataflow).
   *  The grouped fixture frame feeds both the sidecar walk and the
   *  blob join, so it is localCheckpoint'ed (batch-bounded input,
   *  the multiply-referenced-lineage contract). */
  private def cdxFetch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val date = "2026-01-01T00:00:00Z"
    val grouped = T(s, dir, "documents")
      .select(expr("doc_id div 8").as("archive_id"), col("doc_id"),
        col("source"), col("lang"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (arch, it) =>
        val W = graft.operators.Warc
        val ds = it.toSeq.sortBy(_._2)
        val recs = (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date) ->
          "software: graft\r\n".getBytes(UTF_8)) +:
          ds.map { case (_, id, source, lang) =>
            Seq("WARC-Type" -> "response",
              "WARC-Target-URI" -> s"https://example.com/doc/$id",
              "WARC-Date" -> date) ->
              W.httpResponseBytes(
                s"body of doc $id by $source in $lang".getBytes(UTF_8),
                "text/plain; charset=utf-8")
          }
        val (blob, idx) = W.encodeWarcGzIndexed(recs)
        val cdx = ds.zip(idx.drop(1)).map {
          case ((_, id, _, _), (off, len)) =>
            W.cdxjLine(s"https://example.com/doc/$id",
              (20260101000000L + id).toString, Seq(
                "url" -> s"https://example.com/doc/$id",
                "mime" -> (if (id % 2 == 0) "text/html" else "text/plain"),
                "status" -> "200",
                "offset" -> off.toString, "length" -> len.toString,
                "filename" -> s"crawl-$arch.warc.gz"))
        }.mkString("\n")
        (arch, blob, cdx)
      }.toDF("archive_id", "payload", "cdx")
      .localCheckpoint()
    val picks = graft.operators.Warc
      .cdxjRecords(grouped.select("archive_id", "cdx"), "cdx")
      .select(col("archive_id"),
        get_json_object(col("json"), "$['offset']").cast("long")
          .as("offset"),
        get_json_object(col("json"), "$['length']").cast("long")
          .as("length"),
        get_json_object(col("json"), "$['mime']").as("mime"))
      .where(col("mime") === "text/html")
      .groupBy(col("archive_id"))
      .agg(sort_array(collect_list(struct(col("offset"), col("length"))))
        .as("picks"))
    graft.operators.Warc.recordsAt(
        grouped.select("archive_id", "payload")
          .join(picks, Seq("archive_id")),
        "payload", "picks")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("target_uri"), col("http_status"), col("body").as("text"))
  }

  private val cdxFetchSql =
    """SELECT doc_id,
      |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  CAST(200 AS INTEGER) AS http_status,
      |  'body of doc ' || CAST(doc_id AS VARCHAR) || ' by ' || source
      |    || ' in ' || lang AS text
      |FROM documents WHERE doc_id % 2 = 0""".stripMargin

  /** CRAWL POLITENESS — RFC 9309 robots.txt decisions: each document
   *  carries a two-group robots file built from its columns (a `*`
   *  group with a disallow-prefix + longer allow-override + crawl
   *  delay, and a named bot group), a per-parity agent and path, and
   *  `Robots.decisions` appends the verdict. The oracle replays the
   *  longest-match rule as CASE arithmetic over the parities. */
  private def robotsDecide(s: SparkSession, dir: String): DataFrame = {
    val rows = T(s, dir, "documents").select(col("doc_id"), col("lang"),
      concat(
        lit("# synthetic\nUser-agent: *\nDisallow: /"), col("lang"),
        lit("/\nAllow: /"), col("lang"),
        lit("/pub*\nCrawl-delay: "), (col("doc_id") % 5).cast("string"),
        lit("\n\nUser-agent: graftbot\nDisallow: /private$\n\nSitemap: https://x.test/"),
        col("lang"), lit(".xml\n")).as("robots"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("GraftBot/1.0"))
        .otherwise(lit("webcrawler/2")).as("agent"),
      when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("/"), col("lang"), lit("/pub/data")))
        .otherwise(concat(lit("/"), col("lang"), lit("/page"))).as("path"))
    graft.operators.Robots.decisions(rows, "robots", "agent", "path")
      .select(col("doc_id"), col("agent"), col("path"), col("allowed"),
        col("matched_rule"), col("crawl_delay_ms"), col("n_sitemaps"))
  }

  private val robotsDecideSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'GraftBot/1.0'
      |       ELSE 'webcrawler/2' END AS agent,
      |  '/' || lang || CASE WHEN doc_id % 2 = 0 THEN '/pub/data'
      |                      ELSE '/page' END AS path,
      |  (doc_id % 3 = 0 OR doc_id % 2 = 0) AS allowed,
      |  CASE WHEN doc_id % 3 = 0 THEN ''
      |       WHEN doc_id % 2 = 0 THEN '/' || lang || '/pub*'
      |       ELSE '/' || lang || '/' END AS matched_rule,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN -1
      |            ELSE (doc_id % 5) * 1000 END AS BIGINT) AS crawl_delay_ms,
      |  CAST(1 AS BIGINT) AS n_sitemaps
      |FROM documents""".stripMargin

  /** CRAWL→CORPUS FLAGSHIP — the full stage-zero chain on REAL crawl
   *  bytes: .warc.gz archives → record walk → HTTP response bodies →
   *  HTML extraction → C4 line rules → per-language corpus accounting
   *  (pages, passing pages, token volume). Every stage is one the board
   *  already certifies in isolation (`io_warc_extract`,
   *  `text_html_extract`, `pipeline_web_extract`); this row certifies
   *  the COMPOSITION — the handoff types, the pass-through of doc keys
   *  across the 1:N record explode, and the aggregate shapes.
   *  100 TB shape: everything up to the final groupBy is per-row
   *  (archives never shuffle — records do); the aggregate shuffles one
   *  slim row per page onto |langs| keys with map-side partials. */
  private def crawlCorpus(s: SparkSession, dir: String): DataFrame = {
    val pages = htmlDocs(s, dir).select(col("doc_id"), col("lang"), col("html"),
      concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"))
    val texts = graft.operators.Warc.records(
        graft.operators.Warc.withWarcGzPayload(pages, "html", "uri")
          .drop("html", "uri"),
        "payload")
      .where(col("warc_type") === "response")
      .select(col("doc_id"), col("lang"),
        HtmlText.extract(col("body")).as("text"))
    val cleaned = C4Clean.clean(texts, "text", "doc_id",
        minLineWords = 3, minKeptLines = 3, requireTerminalPunct = false,
        keep = Seq("lang"))
      .select(col("lang"), col("c4_pass"),
        when(col("c4_pass"),
          size(split(translate(col("clean_text"), "\n", " "), " ")).cast("long"))
          .otherwise(0L).as("tokens"))
    cleaned.groupBy(col("lang")).agg(
      count(lit(1)).as("n_pages"),
      sum(when(col("c4_pass"), 1L).otherwise(0L)).as("n_pass"),
      sum(col("tokens")).as("corpus_tokens"))
  }

  private val crawlCorpusSql =
    s"""WITH ext AS (
      |  SELECT doc_id, lang,
      |  $expectedExtractSql AS text
      |  FROM documents
      |), ln AS (
      |  SELECT doc_id, lang, text, string_split(text, chr(10)) AS lines FROM ext
      |), k AS (
      |  SELECT doc_id, lang, lines,
      |    list_filter(lines, l -> len(string_split(trim(l), ' ')) >= 3
      |      AND trim(l) <> '' AND NOT contains(lower(l), 'javascript')) AS kept,
      |    (NOT contains(lower(text), 'lorem ipsum')
      |      AND NOT contains(text, '{')) AS page_ok
      |  FROM ln
      |), c AS (
      |  SELECT doc_id, lang,
      |    (len(kept) >= 3 AND page_ok) AS c4_pass,
      |    CASE WHEN len(kept) >= 3 AND page_ok THEN len(string_split(
      |      replace(array_to_string(kept, chr(10)), chr(10), ' '), ' '))
      |    ELSE 0 END AS tokens
      |  FROM k
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_pages,
      |  CAST(sum(CASE WHEN c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(tokens) AS BIGINT) AS corpus_tokens
      |FROM c GROUP BY lang""".stripMargin

  /** documents wrapped in a page with REAL boilerplate around the
   *  content: header tagline, nav link bar, a link-dense teaser div
   *  outside any pruned container, a short heading, the content
   *  paragraph, a short promo line, an aside and a footer. Exercises
   *  every [[Html.mainContent]] rule: subtree pruning (header / nav /
   *  aside / footer / head), link density (the teaser div), heading
   *  rescue (h2 kept only when the body is good), and the length rule
   *  (minWords=30 splits the 10–99-word corpus both ways). */
  private def htmlMainDocs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").withColumn("html", concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><style>nav { color: blue; }</style></head><body>"),
      lit("<header><p>Site "), col("source"),
      lit(" tagline with plenty of words to pass any plain length rule here</p></header>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>"),
      lit(" <a href=\"/c\">Contact</a></nav>"),
      lit("<div><a href=\"/x\">read this</a> <a href=\"/y\">more pages</a> links "),
      col("lang"), lit("</div>"),
      lit("<h2>Doc "), col("doc_id"), lit(" overview</h2><p>"),
      expr("replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"),
      lit("</p><p>subscribe now</p>"),
      lit("<aside>a long sidebar block with easily enough words to pass the"),
      lit(" plain length rule on its own merits</aside>"),
      lit("<footer>copyright "), col("source"),
      lit(" all rights reserved</footer></body></html>")))

  private val htmlMainMinWords = 30

  /** MAIN-CONTENT EXTRACTION — boilerplate-aware block scoring
   *  ([[Html.mainContent]]): kept text is heading + content paragraph
   *  when the content clears the word floor, empty otherwise; all the
   *  chrome (header/nav/aside/footer, link-dense teaser, short promo)
   *  drops. The oracle predicts the exact output from the fixture
   *  construction + a replay of the word-count rule. */
  private def htmlMain(s: SparkSession, dir: String): DataFrame =
    htmlMainDocs(s, dir).select(col("doc_id"),
      HtmlText.mainContent(col("html"), minWords = htmlMainMinWords)
        .as("main_text"))
      .withColumn("n_kept",
        expr("size(filter(split(main_text, '\n'), x -> x <> ''))")
          .cast("long"))

  private val expectedMainSql =
    s"""CASE WHEN len(string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')) >= $htmlMainMinWords
      |    THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' overview' || chr(10) ||
      |         regexp_replace(trim(text), ' +', ' ', 'g')
      |    ELSE '' END""".stripMargin

  private val htmlMainSql =
    s"""SELECT doc_id,
      |  $expectedMainSql AS main_text,
      |  CAST(CASE WHEN len(string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')) >= $htmlMainMinWords
      |       THEN 2 ELSE 0 END AS BIGINT) AS n_kept
      |FROM documents""".stripMargin

  /** CRAWL→MAIN-CONTENT FLAGSHIP — `pipeline_crawl_corpus`'s sibling
   *  with the extraction tier real recipes use: .warc.gz bytes →
   *  record walk → response bodies → MAIN-CONTENT extraction (chrome
   *  dropped before line rules ever run) → C4 line rules →
   *  per-language accounting. 100 TB shape: identical to
   *  `pipeline_crawl_corpus` — per-row until the final slim groupBy. */
  private def crawlMain(s: SparkSession, dir: String): DataFrame = {
    val pages = htmlMainDocs(s, dir).select(col("doc_id"), col("lang"),
      col("html"),
      concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"))
    val texts = graft.operators.Warc.records(
        graft.operators.Warc.withWarcGzPayload(pages, "html", "uri")
          .drop("html", "uri"),
        "payload")
      .where(col("warc_type") === "response")
      .select(col("doc_id"), col("lang"),
        HtmlText.mainContent(col("body"), minWords = htmlMainMinWords)
          .as("text"))
    val cleaned = C4Clean.clean(texts, "text", "doc_id",
        minLineWords = 3, minKeptLines = 2, requireTerminalPunct = false,
        keep = Seq("lang"))
      .select(col("lang"), col("c4_pass"),
        when(col("c4_pass"),
          size(split(translate(col("clean_text"), "\n", " "), " ")).cast("long"))
          .otherwise(0L).as("tokens"))
    cleaned.groupBy(col("lang")).agg(
      count(lit(1)).as("n_pages"),
      sum(when(col("c4_pass"), 1L).otherwise(0L)).as("n_pass"),
      sum(col("tokens")).as("corpus_tokens"))
  }

  private val crawlMainSql =
    s"""WITH ext AS (
      |  SELECT doc_id, lang,
      |  $expectedMainSql AS text
      |  FROM documents
      |), ln AS (
      |  SELECT doc_id, lang, text, string_split(text, chr(10)) AS lines FROM ext
      |), k AS (
      |  SELECT doc_id, lang, lines,
      |    list_filter(lines, l -> len(string_split(trim(l), ' ')) >= 3
      |      AND trim(l) <> '' AND NOT contains(lower(l), 'javascript')) AS kept,
      |    (NOT contains(lower(text), 'lorem ipsum')
      |      AND NOT contains(text, '{')) AS page_ok
      |  FROM ln
      |), c AS (
      |  SELECT doc_id, lang,
      |    (len(kept) >= 2 AND page_ok) AS c4_pass,
      |    CASE WHEN len(kept) >= 2 AND page_ok THEN len(string_split(
      |      replace(array_to_string(kept, chr(10)), chr(10), ' '), ' '))
      |    ELSE 0 END AS tokens
      |  FROM k
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_pages,
      |  CAST(sum(CASE WHEN c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(tokens) AS BIGINT) AS corpus_tokens
      |FROM c GROUP BY lang""".stripMargin

  /** CRAWL-GATE BATCH FACE — the decision body the streaming
   *  politeness gate runs per micro-batch
   *  ([[graft.streaming.StreamingLens.crawlDecide]]), certified against
   *  DuckDB: fetch-candidate URLs (some needing canonicalization —
   *  uppercase scheme/host, explicit default port) probe a per-host
   *  robots table (one host per `source`; /private/ disallowed with a
   *  crawl delay derived from the source name; every third host absent
   *  → RFC no-robots default). The oracle predicts canonical URL, host,
   *  verdict, matched rule, delay and sitemap count from the columns.
   *  100 TB shape: see crawlDecide — batch-host semi-join slices the
   *  robots dimension before any broadcast, per-row decision, the URL
   *  side never shuffles. */
  private def crawlGateBatch(s: SparkSession, dir: String): DataFrame = {
    val urls = T(s, dir, "documents").select(col("doc_id"), col("source"),
      concat(
        when(pmod(col("doc_id"), lit(5)) === 0, lit("HTTPS://"))
          .otherwise(lit("https://")),
        when(pmod(col("doc_id"), lit(5)) === 0, upper(col("source")))
          .otherwise(col("source")),
        lit(".example.com"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit(":443")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("/private/doc"), col("doc_id")))
          .otherwise(concat(lit("/pub/doc"), col("doc_id")))).as("url"))
    // robots dimension: sources ending in 2/5/8 have NO robots row
    val robots = T(s, dir, "documents").select(col("source")).distinct()
      .where(!substring(col("source"), -1, 1).isin("2", "5", "8"))
      .select(concat(col("source"), lit(".example.com")).as("host"),
        concat(lit("User-agent: *\nDisallow: /private/\nCrawl-delay: "),
          (ascii(substring(col("source"), -1, 1)) % 5).cast("string"),
          lit("\nSitemap: https://x.test/map.xml\n")).as("robots"))
    graft.streaming.StreamingLens
      // batch face: corpus-scale input — canon re-scans instead of
      // materializing, and NO forced broadcast hints (the batch's
      // distinct hosts are the host universe, so the robots slice is
      // full-dimension-sized; AQE decides from measured sizes — see
      // crawlDecide's checkpointCanon/broadcastBounded contract)
      .crawlDecide(urls, "url", "graftbot/1.0", robots,
        checkpointCanon = false, broadcastBounded = false)
      .select(col("doc_id"), col("canon_url"), col("host"), col("allowed"),
        col("matched_rule"), col("crawl_delay_ms"), col("n_sitemaps"))
  }

  private val crawlGateBatchSql =
    """WITH u AS (
      |  SELECT doc_id, source,
      |    source[-1] IN ('2', '5', '8') AS norobots
      |  FROM documents
      |)
      |SELECT doc_id,
      |  'https://' || source || '.example.com' ||
      |    CASE WHEN doc_id % 2 = 0 THEN '/private/doc' ELSE '/pub/doc' END ||
      |    CAST(doc_id AS VARCHAR) AS canon_url,
      |  source || '.example.com' AS host,
      |  (norobots OR doc_id % 2 = 1) AS allowed,
      |  CASE WHEN NOT norobots AND doc_id % 2 = 0 THEN '/private/'
      |       ELSE '' END AS matched_rule,
      |  CAST(CASE WHEN norobots THEN -1
      |            ELSE (ascii(source[-1]) % 5) * 1000 END AS BIGINT)
      |    AS crawl_delay_ms,
      |  CAST(CASE WHEN norobots THEN 0 ELSE 1 END AS BIGINT) AS n_sitemaps
      |FROM u""".stripMargin

  /** SITEMAP DISCOVERY — the fetch-side complement of `text_robots`
   *  (whose Sitemap: lines point here): each document carries a 2-entry
   *  urlset built from its columns (entity in the loc, lastmod,
   *  priority, changefreq), exploded by `Sitemap.entries`; the oracle
   *  predicts each entry field-for-field. */
  private def sitemapEntries(s: SparkSession, dir: String): DataFrame = {
    val rows = T(s, dir, "documents").select(col("doc_id"),
      concat(
        lit("<?xml version=\"1.0\"?>\n<urlset>\n<url><loc>https://"),
        col("source"), lit(".example.com/"), col("lang"),
        lit("/a&amp;b</loc><lastmod>2026-01-0"),
        (col("doc_id") % 9 + 1).cast("string"),
        lit("</lastmod><priority>0."), (col("doc_id") % 10).cast("string"),
        lit("</priority></url>\n<url><loc>https://"), col("source"),
        lit(".example.com/"), col("lang"),
        lit("/p2</loc><changefreq>daily</changefreq></url>\n</urlset>"))
        .as("xml"))
    graft.operators.Sitemap.entries(rows, "xml")
      .select(col("doc_id"), col("entry_idx"), col("kind"), col("loc"),
        col("lastmod"), col("changefreq"), col("priority_milli"))
  }

  private val sitemapSql =
    """SELECT doc_id, CAST(e.ei AS INTEGER) AS entry_idx, 'url' AS kind,
      |  'https://' || source || '.example.com/' || lang ||
      |    CASE e.ei WHEN 0 THEN '/a&b' ELSE '/p2' END AS loc,
      |  CASE e.ei WHEN 0 THEN '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
      |            ELSE '' END AS lastmod,
      |  CASE e.ei WHEN 0 THEN '' ELSE 'daily' END AS changefreq,
      |  CAST(CASE e.ei WHEN 0 THEN (doc_id % 10) * 100 ELSE -1 END
      |    AS BIGINT) AS priority_milli
      |FROM documents, (VALUES (0), (1)) e(ei)""".stripMargin

  // -------------------------------------------------------------- URLs

  /** documents dressed as crawl records: a messy source URL (mixed-case
   *  scheme/host, default port, dot-segments, tracking params, fragment)
   *  and a messy link target on a per-language wiki host. Every
   *  canonicalization rule fires on driver data. */
  private def crawlUrls(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").select(col("doc_id"), col("source"), col("lang"),
      concat(
        when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://WWW."), col("source"), lit(".Example.COM"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(":80")).otherwise(lit(":443")),
        lit("/a/./"), col("lang"), lit("/../"), col("lang"), lit("/page"),
        lit("?utm_source=feed&id="), col("doc_id"),
        lit("&fbclid=xyz&q="), col("lang"),
        lit("#sec"), col("doc_id")).as("src_url"),
      concat(lit("HTTPS://"), col("lang"), lit(".WIKI.org:443/wiki/./"),
        col("source"), lit("/../Main#x")).as("dst_url"))

  private val hostRe = "^[a-z0-9+.-]+://([^/?#]+)"

  private def urlCanon(s: SparkSession, dir: String): DataFrame =
    crawlUrls(s, dir)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.Url.canonicalize(col("src_url"))
          .as("canon_url"))
      .select(col("doc_id"), col("canon_url"),
        org.apache.spark.sql.graft.Url.registeredDomain(
          regexp_extract(col("canon_url"), hostRe, 1)).as("reg_domain"))

  private val urlCanonSql =
    """SELECT doc_id,
      |  (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) ||
      |  '://www.' || source || '.example.com/a/' || lang || '/page?id=' ||
      |  CAST(doc_id AS VARCHAR) || '&q=' || lang AS canon_url,
      |  'example.com' AS reg_domain
      |FROM documents""".stripMargin

  /** Flagship: the Common Crawl host-rank shape — canonicalize crawl
   *  URLs, extract hosts, build the host link graph, run the existing
   *  [[graft.operators.Pagerank]] power iteration over it. Source hosts
   *  (one per `source`) link to per-language wiki hosts, which are all
   *  dangling — the dangling-mass path is live.
   *
   *  100 TB shape: canonicalization fuses into the scan; host-id
   *  assignment goes through [[graft.operators.GlobalSequence]]
   *  (range-partition + zipWithIndex — no single-partition window), so
   *  the plan survives a Common-Crawl-sized host dimension (~1e8
   *  hosts); the id mapping back onto edges is a SHUFFLE join on host
   *  (no broadcast hint — a 1e8-row dim can't broadcast; AQE converts
   *  locally when the dim is actually small); PageRank then shuffles
   *  slim (id, rank) pairs per round. */
  private val hostRankIters = 5
  private def hostRank(s: SparkSession, dir: String): DataFrame = {
    val canon = crawlUrls(s, dir).select(
      regexp_extract(org.apache.spark.sql.graft.Url.canonicalize(col("src_url")),
        hostRe, 1).as("shost"),
      regexp_extract(org.apache.spark.sql.graft.Url.canonicalize(col("dst_url")),
        hostRe, 1).as("dhost"))
    // referenced three times below — checkpoint so the range exchange +
    // zipWithIndex lineage runs once, and DROP the broadcast hints: at
    // the Common Crawl scale this flagship names (~1e8 hosts) a forced
    // broadcast of the host dimension OOMs; the honest plan is a
    // shuffle join on host (AQE may still convert locally when small)
    val hosts = graft.operators.GlobalSequence.withSequentialId(
      canon.select(col("shost").as("host"))
        .union(canon.select(col("dhost").as("host"))).distinct(),
      col("host"), "id").localCheckpoint()
    val e = canon
      .join(hosts.select(col("host").as("shost"), col("id").as("sid")),
        Seq("shost"))
      .join(hosts.select(col("host").as("dhost"), col("id").as("did")),
        Seq("dhost"))
      .select(col("sid"), col("did"))
    val pr = graft.operators.Pagerank.run(e, "sid", "did", iters = hostRankIters)
    pr.join(hosts, pr("node_id") === hosts("id"))
      .select(col("host"), col("pr_nano"))
  }

  private val hostRankSql =
    s"""WITH u AS (
      |  SELECT 'www.' || source || '.example.com' AS shost,
      |         lang || '.wiki.org' AS dhost
      |  FROM documents
      |),
      |hosts AS (
      |  SELECT host, CAST(row_number() OVER (ORDER BY host) AS BIGINT) AS id
      |  FROM (SELECT DISTINCT shost AS host FROM u
      |        UNION SELECT DISTINCT dhost FROM u) t
      |),
      |e AS (SELECT DISTINCT s.id AS src, d.id AS dst
      |      FROM u JOIN hosts s ON s.host = u.shost
      |             JOIN hosts d ON d.host = u.dhost),
      |nodes AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
      |  FROM e GROUP BY src),
      |r0 AS (SELECT node_id, CAST(1000000000 // n AS BIGINT) AS pr
      |  FROM nodes CROSS JOIN nn),
      |${RelationalQueries.pagerankIterCtes(hostRankIters)}
      |SELECT h.host, pr AS pr_nano
      |FROM r$hostRankIters JOIN hosts h ON node_id = h.id""".stripMargin

  /** CRAWL-FRONTIER SCHEDULE — the per-host politeness ledger
   *  ([[graft.streaming.StreamingLens.frontierSchedule]]) that closes
   *  the crawl loop opened by `pipeline_crawl_gate`: a synthetic audit
   *  log (one row per host per batch, doc_id%4 as batch, delay a
   *  deterministic host/batch function with the RFC -1 default mixed
   *  in) plus a fetch-completion log with a never-fetched host slice
   *  (sources ending in 7). The oracle replays the latest-batch-wins
   *  delay pick (`arg_max`), budget sums, and
   *  `last_fetch + max(delay, 0)` eligibility arithmetic exactly.
   *  100 TB shape: see frontierSchedule — host-keyed aggregates over
   *  per-host logs, slim rows, no broadcast hint. */
  private def crawlFrontier(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents").select(
      concat(col("source"), lit(".example.com")).as("host"),
      (col("doc_id") % 4).as("batch_id"),
      col("doc_id"))
    val audit = base.groupBy(col("host"), col("batch_id")).agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_admitted"))
      .withColumn("crawl_delay_ms",
        when((ascii(substring(col("host"), 1, 1)) + col("batch_id")) % 4
            === 0, lit(-1L))
          .otherwise(
            ((ascii(substring(col("host"), 1, 1)) + col("batch_id")) % 5)
              * lit(1000L)))
    val fetches = base
      .where(col("doc_id") % 3 === 0 &&
        !col("host").endsWith("7.example.com"))
      .select(col("host"), (col("doc_id") * 100L).as("fetch_ts_ms"))
    graft.streaming.StreamingLens.frontierSchedule(audit, fetches)
      .select(col("host"), col("crawl_delay_ms").cast("long"),
        col("n_admitted_total").cast("long"), col("n_batches").cast("long"),
        col("last_fetch_ms").cast("long"), col("next_eligible_ms").cast("long"))
  }

  private val crawlFrontierSql =
    """WITH base AS (
      |  SELECT source || '.example.com' AS host,
      |    doc_id % 4 AS batch_id, doc_id
      |  FROM documents
      |), audit AS (
      |  SELECT host, batch_id,
      |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_admitted,
      |    CASE WHEN (ascii(substring(host, 1, 1)) + batch_id) % 4 = 0
      |         THEN -1
      |         ELSE ((ascii(substring(host, 1, 1)) + batch_id) % 5) * 1000
      |    END AS crawl_delay_ms
      |  FROM base GROUP BY host, batch_id
      |), fetches AS (
      |  SELECT host, doc_id * 100 AS fetch_ts_ms FROM base
      |  WHERE doc_id % 3 = 0 AND host NOT LIKE '%7.example.com'
      |), latest AS (
      |  SELECT host,
      |    arg_max(crawl_delay_ms, batch_id) AS crawl_delay_ms,
      |    sum(n_admitted) AS n_admitted_total,
      |    count(*) AS n_batches
      |  FROM audit GROUP BY host
      |), last AS (
      |  SELECT host, max(fetch_ts_ms) AS last_fetch_ms FROM fetches
      |  GROUP BY host
      |)
      |SELECT latest.host,
      |  CAST(latest.crawl_delay_ms AS BIGINT) AS crawl_delay_ms,
      |  CAST(n_admitted_total AS BIGINT) AS n_admitted_total,
      |  CAST(n_batches AS BIGINT) AS n_batches,
      |  CAST(coalesce(last_fetch_ms, -1) AS BIGINT) AS last_fetch_ms,
      |  CAST(CASE WHEN last_fetch_ms IS NULL THEN 0
      |            ELSE last_fetch_ms +
      |              greatest(latest.crawl_delay_ms, 0) END AS BIGINT)
      |    AS next_eligible_ms
      |FROM latest LEFT JOIN last ON latest.host = last.host""".stripMargin

  /** WET INGEST FLAGSHIP — the sidecar profile real corpus users
   *  consume (Common Crawl WET = extracted-text `conversion` records,
   *  no HTTP framing): a deterministic 3-line WET body per document
   *  (collapsed text, an always-kept summary line, a 2-word byline the
   *  C4 line rule drops) rides a real .warc.gz conversion record
   *  through [[graft.operators.Warc.wetText]], then the SAME C4 line
   *  rules + per-language accounting as `pipeline_crawl_corpus` — the
   *  oracle replays every stage from document columns.
   *  100 TB shape: per-row until the final slim groupBy; archive blobs
   *  never shuffle. */
  private def wetIngest(s: SparkSession, dir: String): DataFrame = {
    val pages = T(s, dir, "documents").select(col("doc_id"), col("lang"),
      concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"),
      concat(
        regexp_replace(trim(col("text")), " +", " "), lit("\n"),
        lit("summary for doc "), col("doc_id"), lit(" in "), col("lang"),
        lit(" language today\nby "), col("source")).as("wet"))
    val texts = graft.operators.Warc.wetText(
        graft.operators.Warc.withSidecarGzPayload(pages, "wet", "uri",
          "conversion", "text/plain").drop("wet", "uri"),
        "payload")
      .select(col("doc_id"), col("lang"), col("text"))
    val cleaned = C4Clean.clean(texts, "text", "doc_id",
        minLineWords = 3, minKeptLines = 2, requireTerminalPunct = false,
        keep = Seq("lang"))
      .select(col("lang"), col("c4_pass"),
        when(col("c4_pass"),
          size(split(translate(col("clean_text"), "\n", " "), " ")).cast("long"))
          .otherwise(0L).as("tokens"))
    cleaned.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("c4_pass"), 1L).otherwise(0L)).as("n_pass"),
      sum(col("tokens")).as("corpus_tokens"))
  }

  private val wetIngestSql =
    """WITH ext AS (
      |  SELECT doc_id, lang,
      |    regexp_replace(trim(text), ' +', ' ', 'g') || chr(10) ||
      |    'summary for doc ' || CAST(doc_id AS VARCHAR) || ' in ' || lang ||
      |    ' language today' || chr(10) || 'by ' || source AS text
      |  FROM documents
      |), ln AS (
      |  SELECT doc_id, lang, text, string_split(text, chr(10)) AS lines FROM ext
      |), k AS (
      |  SELECT doc_id, lang, lines,
      |    list_filter(lines, l -> len(string_split(trim(l), ' ')) >= 3
      |      AND trim(l) <> '' AND NOT contains(lower(l), 'javascript')) AS kept,
      |    (NOT contains(lower(text), 'lorem ipsum')
      |      AND NOT contains(text, '{')) AS page_ok
      |  FROM ln
      |), c AS (
      |  SELECT doc_id, lang,
      |    (len(kept) >= 2 AND page_ok) AS c4_pass,
      |    CASE WHEN len(kept) >= 2 AND page_ok THEN len(string_split(
      |      replace(array_to_string(kept, chr(10)), chr(10), ' '), ' '))
      |    ELSE 0 END AS tokens
      |  FROM k
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN c4_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(tokens) AS BIGINT) AS corpus_tokens
      |FROM c GROUP BY lang""".stripMargin

  /** WAT EXTRACT — the metadata sidecar profile (Common Crawl WAT =
   *  Envelope JSON in `metadata` records): a deterministic envelope
   *  (header URI, HTTP status, page title, a variable-length Links
   *  array) rides a real .warc.gz metadata record through
   *  [[graft.operators.Warc.watJson]]; field extraction stays inside
   *  Catalyst (`get_json_object` bracket paths for the hyphenated
   *  Common Crawl keys + `json_array_length`) — no custom JSON walker.
   *  The oracle predicts every field from document columns. */
  private def watExtract(s: SparkSession, dir: String): DataFrame = {
    val rows = T(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"),
      concat(
        lit("{\"Envelope\":{\"WARC-Header-Metadata\":{\"WARC-Type\":\"response\"," +
          "\"WARC-Target-URI\":\"https://example.com/doc/"), col("doc_id"),
        lit("\"},\"Payload-Metadata\":{\"HTTP-Response-Metadata\":{" +
          "\"Response-Message\":{\"Status\":\""),
        (lit(200) + pmod(col("doc_id"), lit(2)) * 104).cast("string"),
        lit("\"},\"HTML-Metadata\":{\"Head\":{\"Title\":\"Doc "), col("doc_id"),
        lit("\"},\"Links\":["),
        array_join(transform(
          sequence(lit(1), (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          i => concat(lit("{\"url\":\"/l"), i, lit("\"}"))), ","),
        lit("]}}}}}")).as("wat"))
    graft.operators.Warc.watJson(
        graft.operators.Warc.withSidecarGzPayload(rows, "wat", "uri",
          "metadata", "application/json").drop("wat", "uri"),
        "payload")
      .select(col("doc_id"), col("target_uri"),
        get_json_object(col("json"),
          "$['Envelope']['WARC-Header-Metadata']['WARC-Target-URI']")
          .as("wat_uri"),
        get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['Response-Message']['Status']").cast("long").as("status"),
        get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata']['Head']['Title']").as("title"),
        json_array_length(get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata']['Links']")).cast("long").as("n_links"))
  }

  private val watExtractSql =
    """SELECT doc_id,
      |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
      |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS wat_uri,
      |  CAST(200 + (doc_id % 2) * 104 AS BIGINT) AS status,
      |  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
      |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_links
      |FROM documents""".stripMargin

  /** WAT LINK GRAPH — the production reason WAT sidecars exist: outlink
   *  extraction WITHOUT fetching page bodies. Each document's envelope
   *  carries a variable-length Links array of absolute URLs (targets a
   *  deterministic host function of doc_id and link index); the chain
   *  is watJson → `from_json` the Links array (typed, Catalyst-side) →
   *  explode → host extraction on both ends → per-target-host inlink
   *  accounting (edge volume + distinct source hosts), the input shape
   *  `pipeline_host_rank` consumes. The oracle unrolls the link index
   *  with generate_series and replays the host arithmetic.
   *  100 TB shape: per-row until the slim (dst_host) groupBy; the
   *  distinct-source count shuffles (dst, src) pairs — host-dimension
   *  bounded, with map-side partial aggregation. */
  private def watLinkGraph(s: SparkSession, dir: String): DataFrame = {
    val rows = T(s, dir, "documents").select(col("doc_id"), col("source"),
      concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id")).as("uri"),
      concat(
        lit("{\"Envelope\":{\"WARC-Header-Metadata\":{\"WARC-Target-URI\":" +
          "\"https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id"),
        lit("\"},\"Payload-Metadata\":{\"HTTP-Response-Metadata\":{" +
          "\"HTML-Metadata\":{\"Links\":["),
        array_join(transform(
          sequence(lit(1), (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          i => concat(lit("{\"url\":\"https://t"),
            pmod(col("doc_id") + i, lit(7)), lit(".example.com/p"), i,
            lit("\"}"))), ","),
        lit("]}}}}}")).as("wat"))
    val links = graft.operators.Warc.watJson(
        graft.operators.Warc.withSidecarGzPayload(rows, "wat", "uri",
          "metadata", "application/json").drop("wat", "uri"),
        "payload")
      .select(
        regexp_extract(col("target_uri"), "^[a-z0-9+.-]+://([^/?#]+)", 1)
          .as("src_host"),
        explode(from_json(get_json_object(col("json"),
          "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata']['Links']"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("url",
                org.apache.spark.sql.types.StringType)))))).as("link"))
      .select(col("src_host"),
        regexp_extract(col("link").getField("url"),
          "^[a-z0-9+.-]+://([^/?#]+)", 1).as("dst_host"))
    links.groupBy(col("dst_host")).agg(
      count(lit(1)).as("n_inlinks"),
      countDistinct(col("src_host")).as("n_src_hosts"))
  }

  private val watLinkGraphSql =
    """WITH l AS (
      |  SELECT doc_id, source || '.example.com' AS src_host,
      |    unnest(generate_series(1, CAST(doc_id % 4 + 1 AS INT))) AS i
      |  FROM documents
      |)
      |SELECT 't' || CAST((doc_id + i) % 7 AS VARCHAR) || '.example.com'
      |    AS dst_host,
      |  CAST(count(*) AS BIGINT) AS n_inlinks,
      |  CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
      |FROM l GROUP BY 1""".stripMargin

  /** FRONTIER ENFORCEMENT — the batch face of
   *  [[graft.streaming.StreamingLens.frontierAdmit]], consuming the
   *  `pipeline_crawl_frontier` ledger: candidates (one per document,
   *  unique desired-fetch ts, every fifth on a FRESH host absent from
   *  the ledger) join the per-host `next_eligible_ms` and each host
   *  releases exactly its earliest eligible candidate; the oracle
   *  replays the ledger CTEs plus the eligibility filter and the
   *  min-ts winner pick. 100 TB shape: see frontierAdmit. */
  private def frontierAdmit(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents").select(
      concat(col("source"), lit(".example.com")).as("host"),
      (col("doc_id") % 4).as("batch_id"),
      col("doc_id"))
    val audit = base.groupBy(col("host"), col("batch_id")).agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_admitted"))
      .withColumn("crawl_delay_ms",
        when((ascii(substring(col("host"), 1, 1)) + col("batch_id")) % 4
            === 0, lit(-1L))
          .otherwise(
            ((ascii(substring(col("host"), 1, 1)) + col("batch_id")) % 5)
              * lit(1000L)))
    val fetches = base
      .where(col("doc_id") % 3 === 0 &&
        !col("host").endsWith("7.example.com"))
      .select(col("host"), (col("doc_id") * 100L).as("fetch_ts_ms"))
    val ledger = graft.streaming.StreamingLens
      .frontierSchedule(audit, fetches)
    val candidates = T(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("fresh-"), col("source"))).otherwise(col("source")),
        lit(".example.com/doc/"), col("doc_id")).as("url"),
      (col("doc_id") * 150L).as("ts_ms"))
    graft.streaming.StreamingLens
      // batch face: corpus-scale candidates — re-scan instead of
      // materializing (the crawlDecide/checkpointCanon contract); the
      // duplicated lineage is a slim scan + host-keyed aggregates
      .frontierAdmit(candidates, "url", "ts_ms", ledger,
        checkpointJoined = false)
      .select(col("doc_id"), col("host"), col("ts_ms"),
        col("next_eligible_ms").cast("long"), col("admitted"))
  }

  private val frontierAdmitSql =
    """WITH base AS (
      |  SELECT source || '.example.com' AS host,
      |    doc_id % 4 AS batch_id, doc_id
      |  FROM documents
      |), audit AS (
      |  SELECT host, batch_id,
      |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_admitted,
      |    CASE WHEN (ascii(substring(host, 1, 1)) + batch_id) % 4 = 0
      |         THEN -1
      |         ELSE ((ascii(substring(host, 1, 1)) + batch_id) % 5) * 1000
      |    END AS crawl_delay_ms
      |  FROM base GROUP BY host, batch_id
      |), fetches AS (
      |  SELECT host, doc_id * 100 AS fetch_ts_ms FROM base
      |  WHERE doc_id % 3 = 0 AND host NOT LIKE '%7.example.com'
      |), latest AS (
      |  SELECT host, arg_max(crawl_delay_ms, batch_id) AS crawl_delay_ms
      |  FROM audit GROUP BY host
      |), last AS (
      |  SELECT host, max(fetch_ts_ms) AS last_fetch_ms FROM fetches
      |  GROUP BY host
      |), ledger AS (
      |  SELECT latest.host,
      |    CASE WHEN last_fetch_ms IS NULL THEN 0
      |         ELSE last_fetch_ms + greatest(latest.crawl_delay_ms, 0) END
      |      AS next_eligible_ms
      |  FROM latest LEFT JOIN last ON latest.host = last.host
      |), cand AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 'fresh-' || source
      |         ELSE source END || '.example.com' AS host,
      |    'https://' || CASE WHEN doc_id % 5 = 0 THEN 'fresh-' || source
      |         ELSE source END || '.example.com/doc/'
      |      || CAST(doc_id AS VARCHAR) AS url,
      |    doc_id * 150 AS ts_ms
      |  FROM documents
      |), j AS (
      |  SELECT c.doc_id, c.host, c.url, c.ts_ms,
      |    coalesce(l.next_eligible_ms, -1) AS next_eligible_ms,
      |    (c.ts_ms >= greatest(coalesce(l.next_eligible_ms, -1), 0))
      |      AS eligible
      |  FROM cand c LEFT JOIN ledger l ON c.host = l.host
      |), w AS (
      |  SELECT host, doc_id AS win_doc FROM (
      |    SELECT host, doc_id,
      |      row_number() OVER (PARTITION BY host ORDER BY ts_ms, url) AS rn
      |    FROM j WHERE eligible)
      |  WHERE rn = 1
      |)
      |SELECT j.doc_id, j.host, CAST(j.ts_ms AS BIGINT) AS ts_ms,
      |  CAST(j.next_eligible_ms AS BIGINT) AS next_eligible_ms,
      |  coalesce(j.eligible AND j.doc_id = w.win_doc, false) AS admitted
      |FROM j LEFT JOIN w ON j.host = w.host""".stripMargin

  /** MULTI-WAVE FRONTIER REPLAY — the fixed-point face
   *  ([[graft.streaming.StreamingLens.frontierWaves]]): three
   *  scheduling waves over per-host candidate queues, where wave i's
   *  admissions append to the fetch log, the ledger REFOLDS, and wave
   *  i+1 enforces the advanced `next_eligible_ms` — so a second
   *  candidate on the same host is only released once the host's
   *  crawl delay has elapsed past wave 1's fetch. Crawl delays are
   *  tens of seconds against a 30 s wave cadence, so all three
   *  regimes occur: hosts that admit every wave (delay -1), hosts
   *  that skip a wave (delay > waveMs), and candidates still deferred
   *  at the end. The oracle unrolls the three rounds as CTE chains
   *  marked AS MATERIALIZED (each round's frames are referenced
   *  twice; DuckDB would otherwise re-inline the whole chain
   *  ~branch^rounds times). 100 TB shape: see frontierWaves —
   *  O(waves × pool) with one host shuffle per wave. */
  private def frontierWaves(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents").select(
      concat(col("source"), lit(".example.com")).as("host"),
      col("doc_id"))
    // delays keyed on the host's LAST digit (the first char is 's' for
    // every host — zero variance): -1 / 20–100 s against the 30 s wave
    // cadence, so hosts admit every wave, skip waves, or defer out
    val audit = base.groupBy(col("host")).agg(
        count(lit(1)).as("n_admitted"))
      .withColumn("batch_id", lit(0L))
      .withColumn("crawl_delay_ms",
        when(ascii(substring(col("host"), -13, 1)) % 4 === 0, lit(-1L))
          .otherwise((ascii(substring(col("host"), -13, 1)) % 5 + 1)
            * lit(20000L)))
    val fetches = base.where(col("doc_id") % 7 === 0)
      .select(col("host"), (col("doc_id") * 100L).as("fetch_ts_ms"))
    val candidates = T(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id")).as("url"),
      (col("doc_id") * 150L).as("ts_ms"))
    graft.streaming.StreamingLens
      .frontierWaves(candidates, "url", "ts_ms", audit, fetches,
        waves = 3, waveMs = 30000L)
      .select(col("doc_id"), col("host"), col("ts_ms"),
        col("admitted_wave"), col("fetch_ts_ms"))
  }

  private val frontierWavesSql =
    """WITH base AS MATERIALIZED (
      |  SELECT doc_id, source || '.example.com' AS host,
      |    'https://' || source || '.example.com/doc/'
      |      || CAST(doc_id AS VARCHAR) AS url,
      |    doc_id * 150 AS ts_ms
      |  FROM documents
      |), latest AS MATERIALIZED (
      |  SELECT host,
      |    CASE WHEN ascii(substring(host, length(host) - 12, 1)) % 4 = 0
      |         THEN -1
      |         ELSE (ascii(substring(host, length(host) - 12, 1)) % 5 + 1)
      |           * 20000 END
      |      AS crawl_delay_ms
      |  FROM (SELECT DISTINCT host FROM base)
      |), f0 AS MATERIALIZED (
      |  SELECT host, doc_id * 100 AS fetch_ts_ms FROM base
      |  WHERE doc_id % 7 = 0
      |), l0 AS MATERIALIZED (
      |  SELECT a.host,
      |    CASE WHEN f.last_ms IS NULL THEN 0
      |         ELSE f.last_ms + greatest(a.crawl_delay_ms, 0) END AS nel
      |  FROM latest a LEFT JOIN (
      |    SELECT host, max(fetch_ts_ms) AS last_ms FROM f0 GROUP BY host
      |  ) f ON a.host = f.host
      |), e0 AS MATERIALIZED (
      |  SELECT b.doc_id, b.host, b.url, b.ts_ms, b.ts_ms + 0 AS wts,
      |    (b.ts_ms + 0 >= greatest(coalesce(l.nel, -1), 0)) AS elig
      |  FROM base b LEFT JOIN l0 l ON b.host = l.host
      |), a0 AS MATERIALIZED (
      |  SELECT doc_id, host, wts FROM (
      |    SELECT doc_id, host, wts,
      |      row_number() OVER (PARTITION BY host ORDER BY wts, url) AS rn
      |    FROM e0 WHERE elig) WHERE rn = 1
      |), p1 AS MATERIALIZED (
      |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM a0)
      |), f1 AS MATERIALIZED (
      |  SELECT host, fetch_ts_ms FROM f0
      |  UNION ALL SELECT host, wts AS fetch_ts_ms FROM a0
      |), l1 AS MATERIALIZED (
      |  SELECT a.host,
      |    CASE WHEN f.last_ms IS NULL THEN 0
      |         ELSE f.last_ms + greatest(a.crawl_delay_ms, 0) END AS nel
      |  FROM latest a LEFT JOIN (
      |    SELECT host, max(fetch_ts_ms) AS last_ms FROM f1 GROUP BY host
      |  ) f ON a.host = f.host
      |), e1 AS MATERIALIZED (
      |  SELECT b.doc_id, b.host, b.url, b.ts_ms, b.ts_ms + 30000 AS wts,
      |    (b.ts_ms + 30000 >= greatest(coalesce(l.nel, -1), 0)) AS elig
      |  FROM p1 b LEFT JOIN l1 l ON b.host = l.host
      |), a1 AS MATERIALIZED (
      |  SELECT doc_id, host, wts FROM (
      |    SELECT doc_id, host, wts,
      |      row_number() OVER (PARTITION BY host ORDER BY wts, url) AS rn
      |    FROM e1 WHERE elig) WHERE rn = 1
      |), p2 AS MATERIALIZED (
      |  SELECT * FROM p1 WHERE doc_id NOT IN (SELECT doc_id FROM a1)
      |), f2 AS MATERIALIZED (
      |  SELECT host, fetch_ts_ms FROM f1
      |  UNION ALL SELECT host, wts AS fetch_ts_ms FROM a1
      |), l2 AS MATERIALIZED (
      |  SELECT a.host,
      |    CASE WHEN f.last_ms IS NULL THEN 0
      |         ELSE f.last_ms + greatest(a.crawl_delay_ms, 0) END AS nel
      |  FROM latest a LEFT JOIN (
      |    SELECT host, max(fetch_ts_ms) AS last_ms FROM f2 GROUP BY host
      |  ) f ON a.host = f.host
      |), e2 AS MATERIALIZED (
      |  SELECT b.doc_id, b.host, b.url, b.ts_ms, b.ts_ms + 60000 AS wts,
      |    (b.ts_ms + 60000 >= greatest(coalesce(l.nel, -1), 0)) AS elig
      |  FROM p2 b LEFT JOIN l2 l ON b.host = l.host
      |), a2 AS MATERIALIZED (
      |  SELECT doc_id, host, wts FROM (
      |    SELECT doc_id, host, wts,
      |      row_number() OVER (PARTITION BY host ORDER BY wts, url) AS rn
      |    FROM e2 WHERE elig) WHERE rn = 1
      |), p3 AS MATERIALIZED (
      |  SELECT * FROM p2 WHERE doc_id NOT IN (SELECT doc_id FROM a2)
      |)
      |SELECT b.doc_id, b.host, CAST(b.ts_ms AS BIGINT) AS ts_ms,
      |  CAST(w.wave AS INTEGER) AS admitted_wave,
      |  CAST(w.fetch_ts_ms AS BIGINT) AS fetch_ts_ms
      |FROM base b JOIN (
      |  SELECT doc_id, 0 AS wave, wts AS fetch_ts_ms FROM a0
      |  UNION ALL SELECT doc_id, 1 AS wave, wts FROM a1
      |  UNION ALL SELECT doc_id, 2 AS wave, wts FROM a2
      |  UNION ALL SELECT doc_id, -1 AS wave, -1 AS fetch_ts_ms FROM p3
      |) w ON b.doc_id = w.doc_id""".stripMargin

  /** CRAWL LOOP FLAGSHIP — the WHOLE politeness loop in one chain,
   *  certifying the composition the individual rows prove in
   *  isolation: candidate URLs → [[graft.streaming.StreamingLens
   *  .crawlDecide]] robots verdicts (unhinted batch face) → the
   *  per-host audit row [[graft.streaming.StreamingLens.crawlGate]]
   *  appends per batch → a fetch-completion log (every third admitted
   *  doc) → [[graft.streaming.StreamingLens.frontierSchedule]]'s
   *  `next_eligible_ms` ledger → [[graft.streaming.StreamingLens
   *  .frontierAdmit]] enforcing it on the next candidate wave. The
   *  oracle replays all four stages from document columns. 100 TB
   *  shape: the decided wave feeds three host-keyed consumers and
   *  deliberately RE-SCANS (corpus-scale inputs are the caller's to
   *  materialize — the crawlDecide contract); everything shuffled is
   *  host-keyed and slim.
   *
   *  TEMPLATE WARNING: if you copy this composition, localCheckpoint
   *  (or persist) the `decided` frame first — this registered row
   *  re-derives three consumers from it and re-runs URL
   *  canonicalization 3×, which is the documented caller-materializes
   *  contract, not a recommendation. `crawlLoopMaterialized` is the
   *  production shape; `PlanShapeSpec` pins that both faces produce
   *  identical results. */
  private def crawlLoop(s: SparkSession, dir: String): DataFrame =
    crawlLoopImpl(s, dir, materialize = false)

  /** The production variant of [[crawlLoop]]: the decided wave is
   *  localCheckpoint'ed before its three consumers (spec-only). */
  private[graft] def crawlLoopMaterialized(s: SparkSession,
      dir: String): DataFrame = crawlLoopImpl(s, dir, materialize = true)

  private def crawlLoopImpl(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val urls = T(s, dir, "documents").select(col("doc_id"), col("source"),
      concat(
        when(pmod(col("doc_id"), lit(5)) === 0, lit("HTTPS://"))
          .otherwise(lit("https://")),
        when(pmod(col("doc_id"), lit(5)) === 0, upper(col("source")))
          .otherwise(col("source")),
        lit(".example.com"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit(":443")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("/private/doc"), col("doc_id")))
          .otherwise(concat(lit("/pub/doc"), col("doc_id")))).as("url"))
    val robots = T(s, dir, "documents").select(col("source")).distinct()
      .where(!substring(col("source"), -1, 1).isin("2", "5", "8"))
      .select(concat(col("source"), lit(".example.com")).as("host"),
        concat(lit("User-agent: *\nDisallow: /private/\nCrawl-delay: "),
          (ascii(substring(col("source"), -1, 1)) % 5).cast("string"),
          lit("\nSitemap: https://x.test/map.xml\n")).as("robots"))
    val decided0 = graft.streaming.StreamingLens
      .crawlDecide(urls, "url", "graftbot/1.0", robots,
        checkpointCanon = false, broadcastBounded = false)
    val decided = if (materialize) decided0.localCheckpoint() else decided0
    // the per-batch audit row crawlGate appends (one batch here)
    val audit = decided.groupBy(col("host")).agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("allowed"), 1L).otherwise(0L)).as("n_admitted"),
        max(col("crawl_delay_ms")).as("crawl_delay_ms"))
      .withColumn("batch_id", lit(0L))
    val fetches = decided
      .where(col("allowed") && col("doc_id") % 3 === 0)
      .select(col("host"), (col("doc_id") * 100L).as("fetch_ts_ms"))
    val ledger = graft.streaming.StreamingLens
      .frontierSchedule(audit, fetches)
    val wave2 = decided.select(col("doc_id"), col("allowed"),
      col("canon_url").as("url"), (col("doc_id") * 150L).as("ts_ms"))
    graft.streaming.StreamingLens
      .frontierAdmit(wave2, "url", "ts_ms", ledger,
        checkpointJoined = false)
      .select(col("doc_id"), col("host"), col("allowed"), col("ts_ms"),
        col("next_eligible_ms").cast("long"), col("admitted"))
  }

  private val crawlLoopSql =
    """WITH u AS (
      |  SELECT doc_id, source,
      |    source || '.example.com' AS host,
      |    (source[-1] IN ('2', '5', '8') OR doc_id % 2 = 1) AS allowed,
      |    CASE WHEN source[-1] IN ('2', '5', '8') THEN -1
      |         ELSE (ascii(source[-1]) % 5) * 1000 END AS crawl_delay_ms
      |  FROM documents
      |), audit AS (
      |  SELECT host, max(crawl_delay_ms) AS crawl_delay_ms FROM u GROUP BY host
      |), fetches AS (
      |  SELECT host, max(doc_id * 100) AS last_fetch_ms FROM u
      |  WHERE allowed AND doc_id % 3 = 0 GROUP BY host
      |), ledger AS (
      |  SELECT a.host,
      |    CASE WHEN f.last_fetch_ms IS NULL THEN 0
      |         ELSE f.last_fetch_ms + greatest(a.crawl_delay_ms, 0) END
      |      AS next_eligible_ms
      |  FROM audit a LEFT JOIN fetches f ON a.host = f.host
      |), j AS (
      |  SELECT u.doc_id, u.host, u.allowed, u.doc_id * 150 AS ts_ms,
      |    'https://' || u.source || '.example.com'
      |      || CASE WHEN u.doc_id % 2 = 0 THEN '/private/doc'
      |              ELSE '/pub/doc' END
      |      || CAST(u.doc_id AS VARCHAR) AS url,
      |    coalesce(l.next_eligible_ms, -1) AS next_eligible_ms,
      |    (u.doc_id * 150 >= greatest(coalesce(l.next_eligible_ms, -1), 0))
      |      AS eligible
      |  FROM u LEFT JOIN ledger l ON u.host = l.host
      |), w AS (
      |  SELECT host, doc_id AS win_doc FROM (
      |    SELECT host, doc_id,
      |      row_number() OVER (PARTITION BY host ORDER BY ts_ms, url) AS rn
      |    FROM j WHERE eligible)
      |  WHERE rn = 1
      |)
      |SELECT j.doc_id, j.host, j.allowed, CAST(j.ts_ms AS BIGINT) AS ts_ms,
      |  CAST(j.next_eligible_ms AS BIGINT) AS next_eligible_ms,
      |  coalesce(j.eligible AND j.doc_id = w.win_doc, false) AS admitted
      |FROM j LEFT JOIN w ON j.host = w.host""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_crawl_loop" -> (crawlLoop _),
    "pipeline_wet_ingest" -> (wetIngest _),
    "io_wat_extract" -> (watExtract _),
    "pipeline_wat_links" -> (watLinkGraph _),
    "pipeline_frontier_admit" -> (frontierAdmit _),
    "pipeline_frontier_waves" -> (frontierWaves _),
    "text_html_extract" -> (htmlExtract _),
    "pipeline_web_extract" -> (webExtract _),
    "io_warc_extract" -> (warcExtract _),
    "io_warc_charset" -> (warcCharset _),
    "io_warc_revisit" -> (warcRevisit _),
    "pipeline_crawl_revisit" -> (crawlRevisit _),
    "pipeline_redirect_resolve" -> (redirectResolve _),
    "pipeline_recrawl_plan" -> (recrawlPlan _),
    "pipeline_crawl_ops" -> (crawlOps _),
    "io_cdx_zipnum" -> (cdxZipnum _),
    "pipeline_zipnum_fetch" -> (zipnumFetch _),
    "io_cdx_extract" -> (cdxExtract _),
    "pipeline_cdx_fetch" -> (cdxFetch _),
    "text_html_tables" -> (htmlTables _),
    "text_robots" -> (robotsDecide _),
    "text_sitemap" -> (sitemapEntries _),
    "pipeline_crawl_corpus" -> (crawlCorpus _),
    "text_url_canon" -> (urlCanon _),
    "pipeline_host_rank" -> (hostRank _),
    "text_html_main" -> (htmlMain _),
    "pipeline_crawl_main" -> (crawlMain _),
    "pipeline_crawl_gate" -> (crawlGateBatch _),
    "pipeline_crawl_frontier" -> (crawlFrontier _)
  )

  override def oracles: Map[String, String] = Map(
    "pipeline_crawl_loop" -> crawlLoopSql,
    "pipeline_wet_ingest" -> wetIngestSql,
    "io_wat_extract" -> watExtractSql,
    "pipeline_wat_links" -> watLinkGraphSql,
    "pipeline_frontier_admit" -> frontierAdmitSql,
    "pipeline_frontier_waves" -> frontierWavesSql,
    "text_html_extract" -> htmlExtractSql,
    "pipeline_web_extract" -> webExtractSql,
    "io_warc_extract" -> warcExtractSql,
    "io_warc_charset" -> warcCharsetSql,
    "io_warc_revisit" -> warcRevisitSql,
    "pipeline_crawl_revisit" -> crawlRevisitSql,
    "pipeline_redirect_resolve" -> redirectResolveSql,
    "pipeline_recrawl_plan" -> recrawlPlanSql,
    "pipeline_crawl_ops" -> crawlOpsSql,
    "io_cdx_zipnum" -> cdxZipnumSql,
    "pipeline_zipnum_fetch" -> zipnumFetchSql,
    "io_cdx_extract" -> cdxExtractSql,
    "pipeline_cdx_fetch" -> cdxFetchSql,
    "text_html_tables" -> htmlTablesSql,
    "text_robots" -> robotsDecideSql,
    "text_sitemap" -> sitemapSql,
    "pipeline_crawl_corpus" -> crawlCorpusSql,
    "text_url_canon" -> urlCanonSql,
    "pipeline_host_rank" -> hostRankSql,
    "text_html_main" -> htmlMainSql,
    "pipeline_crawl_main" -> crawlMainSql,
    "pipeline_crawl_gate" -> crawlGateBatchSql,
    "pipeline_crawl_frontier" -> crawlFrontierSql
  )
}
