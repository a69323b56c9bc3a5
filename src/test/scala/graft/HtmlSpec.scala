package graft

import graft.operators.Html
import org.apache.spark.sql.graft.HtmlText
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule pins for the HTML->text extractor — every branch of the
 *  tokenizer (raw-text modes, quote-aware tags, entity forms, block vs
 *  inline, whitespace renderer semantics) on hand-computed outputs. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def x(html: String): String = Html.extractText(html)

  test("basic blocks: block tags break lines, inline tags vanish") {
    assert(x("<p>one</p><p>two</p>") == "one\ntwo")
    assert(x("a<b>b</b>c") == "abc")
    assert(x("a<span> b </span>c") == "a b c")
    assert(x("x<br>y<br/>z") == "x\ny\nz")
    assert(x("<ul><li>i1</li><li>i2</li></ul>") == "i1\ni2")
    assert(x("<h1>T</h1>body") == "T\nbody")
  }

  test("script/style raw-text mode: bodies drop whole, fake tags inside never leak") {
    assert(x("a<script>var p = '<p>no</p>';</script>b") == "ab")
    assert(x("a<SCRIPT TYPE=\"text/javascript\">x<y</ScRiPt>b") == "ab")
    assert(x("a<style>p { color: red; } /* <div> */</style>b") == "ab")
    // unterminated script swallows the rest (renderers do the same)
    assert(x("a<script>never closed") == "a")
    // a close tag with attributes/space still ends the raw-text run
    assert(x("a<script>s</script >b") == "ab")
  }

  test("comments, CDATA, doctype, processing instructions drop") {
    assert(x("a<!-- <p>hidden</p> -->b") == "ab")
    assert(x("<!DOCTYPE html><p>t</p>") == "t")
    // CDATA drops to the FIRST "]]>"; later "]]>" is plain text
    assert(x("a<![CDATA[ raw ]]> stuff ]]>b") == "a stuff ]]>b")
    assert(x("a<?php echo 1; ?>b") == "ab")
    assert(x("a<!-- unterminated") == "a")
  }

  test("quote-aware tag scan: '>' inside a quoted attribute does not close the tag") {
    assert(x("""<p title="a > b">t</p>""") == "t")
    assert(x("<a href='x>y'>link</a>") == "link")
  }

  test("literal '<' and '&' that are not markup stay text") {
    assert(x("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    assert(x("fish & chips") == "fish & chips")
    assert(x("&unknown; &amp &;") == "&unknown; &amp &;")
    assert(x("tail<") == "tail<")
  }

  test("entities: named, decimal, hex, nbsp-as-space, malformed kept literal") {
    assert(x("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(x("a&nbsp;b") == "a b")
    assert(x("&#65;&#x42;&#X43;") == "ABC")
    assert(x("&#128512;") == new String(Character.toChars(128512)))
    assert(x("&#;") == "&#;")
    assert(x("&#xD800;") == "&#xD800;") // surrogate cp rejected
    assert(x("&copy; 2026") == "\u00a9 2026")
  }

  test("renderer whitespace: raw newlines collapse, lines trim, empties drop") {
    assert(x("<p>  a\n\n  b\tc  </p>\n\n<p> </p><p>d</p>") == "a b c\nd")
    assert(x("   ") == "")
    assert(x("") == "")
    // pre content normalizes too (documented C4-style choice)
    assert(x("<pre>  keep\n  structure  </pre>") == "keep structure")
  }

  test("full document shape: head title kept, script/style/comment dropped, structure linear") {
    val html =
      "<!DOCTYPE html><html><head><title>Doc 7</title>" +
        "<script>var x = '<p>not text</p>';</script>" +
        "<style>p{color:red}</style></head>" +
        "<body data-src=\"s>1\"><!-- note -->" +
        "<h1 class=\"t\">Title &amp; more</h1>" +
        "<p>hello <b>world</b>&nbsp;again</p>" +
        "<ul><li>one</li><li>two</li></ul>" +
        "<div>tail</div></body></html>"
    assert(x(html) ==
      "Doc 7\nTitle & more\nhello world again\none\ntwo\ntail")
  }

  test("builtin:html_extract lens reaches the extractor through a pipeline") {
    val df = Seq((1L, "<h1>t</h1><p>hello &amp; world</p>")).toDF("doc_id", "html")
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:html_extract",
        |  "arguments":{"col":"html","out":"text"}}]}""".stripMargin)
    val out = pipe.forward(df).select("text").as[String].collect()
    assert(out.toSeq == Seq("t\nhello & world"))
  }

  test("builtin:html_main lens reaches the main-content extractor with args") {
    val long = (1 to 6).map(i => s"w$i").mkString(" ")
    val df = Seq((1L,
      s"<nav><a href=/>Home</a></nav><h2>head line</h2><p>$long</p>" +
        "<footer>junk</footer>")).toDF("doc_id", "html")
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:html_main",
        |  "arguments":{"col":"html","out":"text","min_words":5}}]}""".stripMargin)
    val out = pipe.forward(df).select("text").as[String].collect()
    assert(out.toSeq == Seq(s"head line\n$long"))
  }

  test("extractTables: rows/cells with entities and inline tags, th==td, " +
      "implicit cell close, nested table split out, script dropped, " +
      "unterminated table flushed") {
    import graft.operators.Html
    val t1 = Html.extractTables(
      """<p>pre</p><table><tr><th>K</th><th>V &amp; W</th></tr>
        |<tr><td>a <b>bold</b></td><td>1<script>x="<td>no</td>"</script>2
        |</td></tr></table><p>post</p>""".stripMargin)
    assert(t1 == Seq(Seq(Seq("K", "V & W"), Seq("a bold", "12"))))
    // implicit close: no </td>, next <td>/<tr> closes the cell
    val t2 = Html.extractTables(
      "<table><tr><td>x<td>y<tr><td>z</table>")
    assert(t2 == Seq(Seq(Seq("x", "y"), Seq("z"))))
    // nested table: inner is its own entry (inner-first), outer cell
    // keeps only its own text
    val t3 = Html.extractTables(
      "<table><tr><td>out<table><tr><td>in</td></tr></table></td>" +
        "<td>o2</td></tr></table>")
    assert(t3 == Seq(Seq(Seq("in")), Seq(Seq("out", "o2"))))
    // truncated crawl: unterminated table still flushes
    val t4 = Html.extractTables("<table><tr><td>cut")
    assert(t4 == Seq(Seq(Seq("cut"))))
    // no tables -> empty
    assert(Html.extractTables("<p>plain</p>").isEmpty)
  }

  test("tables(): Spark 1:N explode keeps keys and indexes rows") {
    import graft.operators.Html
    val df = Seq(
      (1L, "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"),
      (2L, "<p>no table</p>")).toDF("doc_id", "html")
    val got = Html.tables(df, "html")
      .select("doc_id", "table_idx", "row_idx", "n_cells", "cells")
      .as[(Long, Int, Int, Long, Seq[String])].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, 0, 0, 2L, Seq("a", "b")),
      (1L, 0, 1, 1L, Seq("c"))))
  }

  test("review fixes: '<' before a digit is literal text, a longer tag " +
      "name does not close a raw-text element, truncated sitemap close " +
      "tag terminates, '//' paths stay distinct") {
    import graft.operators.{Html, Sitemap, Urls}
    // '<3' / '1<2' are text in every browser, not tag opens
    assert(Html.extractText("I <3 Spark, 1<2 is true") ==
      "I <3 Spark, 1<2 is true")
    // </styleguide> must NOT close <style>
    assert(Html.extractText(
      "<style>a{} </styleguide> b{} </style>text") == "text")
    assert(Html.extractText(
      "<script>x</scripty>y</script>z") == "z")
    // sitemap truncated inside a close tag: terminates with the partial
    // entry, never loops
    val es = Sitemap.parse("<urlset><url><loc>http://x</loc")
    assert(es.map(_.loc) == Seq("http://x"))
    // RFC 3986 remove_dot_segments preserves empty segments
    assert(Urls.canonicalizeUrl("https://h.test/a//b") == "https://h.test/a//b")
    assert(Urls.canonicalizeUrl("https://h.test/a//../b") == "https://h.test/a/b")
  }

  test("mainContent: prunes chrome subtrees, drops link-dense and short " +
      "blocks, rescues headings before good blocks") {
    val body = (1 to 12).map(i => s"word$i").mkString(" ") // 12 words
    val page =
      "<html><head><title>Meta Title</title></head><body>" +
        "<header><p>site tagline with lots and lots and lots of words</p></header>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
        // link-dense but LONG: only the link-density rule can drop it
        "<div>" + (1 to 11).map(i => s"<a href=/$i>link$i</a>").mkString(" ") +
        " x</div>" +
        "<h2>Story heading</h2>" +
        s"<p>$body</p>" +
        "<p>subscribe now</p>" +
        "<h3>Dangling heading</h3>" + // next non-empty block is bad -> drops
        "<p>short promo</p>" +
        "<aside>sidebar junk with easily enough words to pass length</aside>" +
        "<footer>copyright</footer></body></html>"
    assert(Html.mainContent(page) == s"Story heading\n$body")

    val blocks = Html.mainBlocks(page)
    // the link-dense div: 11 words of links + 'x' => 12 words (>= default
    // minWords), dropped ONLY by link density
    val dense = blocks.find(_.text.startsWith("link1")).get
    assert(dense.nWords == 12 && !dense.kept)
    assert(dense.linkChars * 1000000L > 330000L * dense.nChars)
    val heading = blocks.find(_.text == "Story heading").get
    assert(heading.isHeading && heading.kept)
    assert(!blocks.find(_.text == "Dangling heading").get.kept)
    assert(!blocks.exists(_.text.contains("tagline")))  // header pruned
    assert(!blocks.exists(_.text.contains("sidebar")))  // aside pruned
    assert(!blocks.exists(_.text.contains("Meta Title"))) // head pruned

    // head auto-closes at <body> even without </head>
    val noClose = "<html><head><title>t</title><body><p>" + body + "</p>"
    assert(Html.mainContent(noClose) == body)

    // nested prune containers: outer close only after inner
    val nested = "<body><nav>a<nav>b</nav>c</nav><p>" + body + "</p></body>"
    assert(Html.mainContent(nested) == body)

    // NBSP (entity or raw char) is whitespace: it splits words for the
    // length rule instead of fusing the paragraph into one giant token
    val nb = "<p>" + (1 to 12).map(i => s"n$i").mkString("&nbsp;") + "</p>"
    val nbBlock = Html.mainBlocks(nb).head
    assert(nbBlock.nWords == 12 && nbBlock.kept, s"nbsp words ${nbBlock.nWords}")
    val rawNb = "<p>" + (1 to 12).map(i => s"m$i").mkString(" ") + "</p>"
    assert(Html.mainBlocks(rawNb).head.nWords == 12)

    // an unclosed <a> must not poison later blocks' link density:
    // HTML5 implicitly closes the active anchor at the next <a>
    val unclosed = "<div><a href=/x>one<a href=/y>two</a> free text</div>" +
      s"<p>$body</p>"
    val ub = Html.mainBlocks(unclosed)
    val content = ub.find(_.text.contains("word1")).get
    assert(content.linkChars == 0 && content.kept,
      s"anchor leak: linkChars=${content.linkChars}")
  }

  test("mainContent column face matches the Scala function and is null-safe") {
    val long = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"<nav><a href=/>x</a></nav><p>$long</p>"),
      (2L, null.asInstanceOf[String])).toDF("id", "html")
    val got = df.select(col("id"),
        HtmlText.mainContent(col("html")).as("t"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains(long))
    assert(got(2L).isEmpty)
  }

  test("column face matches the Scala function and is null-safe") {
    val df = Seq(
      (1L, "<p>a</p><p>b</p>"),
      (2L, null.asInstanceOf[String]),
      (3L, "x &lt;tag&gt; y")).toDF("id", "html")
    val got = df.select(col("id"), HtmlText.extract(col("html")).as("t"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("a\nb"))
    assert(got(2L).isEmpty)
    assert(got(3L).contains("x <tag> y"))
  }
}
