package graft.queries

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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_html_extract" -> (htmlExtract _),
    "pipeline_web_extract" -> (webExtract _)
  )

  override def oracles: Map[String, String] = Map(
    "text_html_extract" -> htmlExtractSql,
    "pipeline_web_extract" -> webExtractSql
  )
}
