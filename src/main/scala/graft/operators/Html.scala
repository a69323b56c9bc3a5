package graft.operators

import scala.collection.mutable

/**
 * HTML → text extraction — the stage every published web-curation recipe
 * (C4 §2.2's input, RefinedWeb, FineWeb) runs BEFORE line-level cleaning.
 * SURVEY.md §2.6 north-star addition; not in the reference (its transforms
 * are opaque WASM guests — reference: host-go/engine/engine.go:1 has no
 * text surface at all). Downstream stages are the repo's existing
 * [[C4Clean]] line rules and [[TextAnalysis.gopherRules]].
 *
 * The rule set is DETERMINISTIC and small enough that an oracle can
 * replay it (or, for synthetic wrappers, predict the exact output):
 *
 *  - `<script>`/`<style>` elements are dropped whole (raw-text mode: the
 *    body is skipped verbatim until the matching case-insensitive close
 *    tag, so `'<p>'` inside a JS string never leaks).
 *  - Comments `<!-- … -->`, CDATA sections `<![CDATA[ … ]]>`, other
 *    `<!…>` declarations (DOCTYPE) and `<?…>` processing instructions
 *    are dropped.
 *  - Tags are scanned with quote-aware attribute parsing (a `>` inside a
 *    quoted attribute value does not close the tag). BLOCK-level tags
 *    (open or close: p, div, br, li, h1–h6, table/tr/td/…, blockquote,
 *    pre, section, article, …) become line breaks; inline tags (b, i,
 *    span, a, …) contribute nothing — `a<b>b</b>` → `ab`, matching how
 *    a browser lays the text out.
 *  - A `<` not opening a tag/declaration is literal text.
 *  - Entities decode: the common named set (`&amp; &lt; &gt; &quot;
 *    &apos; &nbsp; …`) plus numeric `&#NNN;` / `&#xHH;` code points;
 *    unknown or malformed entities stay literal. `&nbsp;` decodes to a
 *    plain space (it exists for layout, not content).
 *  - Whitespace normalizes like a renderer: within each line, runs of
 *    whitespace (including raw newlines in the source — HTML collapses
 *    them) become one space; lines are trimmed; empty lines drop; lines
 *    join with `\n`. (`<pre>` content is normalized too — a deliberate
 *    C4-style simplification, documented here so the oracle can rely on
 *    it.)
 *
 * 100 TB shape: a pure per-row function (one linear scan per document,
 * zero shuffle) exposed as the native expression
 * [[org.apache.spark.sql.graft.HtmlExtract]]; it pipelines inside the
 * scan stage before any downstream shuffle, so extraction adds no
 * exchange to a curation plan.
 */
object Html {

  /** Tags that break the text flow — open OR close emits a newline. */
  val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "dialog", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "header", "hr", "html", "legend", "li", "main", "menu", "nav", "ol",
    "option", "p", "pre", "section", "select", "summary", "table", "tbody",
    "td", "tfoot", "th", "thead", "title", "tr", "ul")

  /** The named entities that decode; everything else stays literal. */
  val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "\u00a9", "reg" -> "\u00ae",
    "trade" -> "\u2122", "hellip" -> "\u2026", "mdash" -> "\u2014",
    "ndash" -> "\u2013", "lsquo" -> "\u2018", "rsquo" -> "\u2019",
    "ldquo" -> "\u201c", "rdquo" -> "\u201d", "middot" -> "\u00b7",
    "bull" -> "\u2022", "laquo" -> "\u00ab", "raquo" -> "\u00bb",
    "deg" -> "\u00b0", "sect" -> "\u00a7", "para" -> "\u00b6",
    "times" -> "\u00d7", "divide" -> "\u00f7", "plusmn" -> "\u00b1",
    "frac12" -> "\u00bd", "frac14" -> "\u00bc", "euro" -> "\u20ac",
    "pound" -> "\u00a3", "cent" -> "\u00a2", "yen" -> "\u00a5")

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** HTML opens a tag only when '<' is followed by an ASCII LETTER
   *  (or '/'); '<3' and '1<2' are literal text in every browser. */
  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Find the real close tag of a raw-text element (script/style) from
   *  `from`: the tag NAME must be followed by '>', '/', whitespace, or
   *  EOF — `</styleguide>` must not close `</style>`. -1 if absent. */
  private def rawTextClose(s: String, name: String, from: Int): Int = {
    var at = from
    while (true) {
      val hit = indexOfIgnoreCase(s, "</" + name, at)
      if (hit < 0) return -1
      val after = hit + 2 + name.length
      if (after >= s.length) return hit
      val c = s.charAt(after)
      if (c == '>' || c == '/' || Character.isWhitespace(c)) return hit
      at = hit + 1
    }
    -1
  }

  /** Case-insensitive search for `needle` (ASCII, lowercase) in `s` from
   *  `from`; -1 if absent. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val last = s.length - n
    while (i <= last) {
      var j = 0
      while (j < n && Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Skip a tag body from the char AFTER the name to PAST the closing
   *  `>`, honoring quoted attribute values; returns the index after `>`
   *  (or `s.length` for an unterminated tag). */
  private def skipTag(s: String, start: Int): Int = {
    var i = start
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  /** Decode the entity starting at `i` (which points at `&`). Returns
   *  (decoded text, index after the entity) or null if the run is not a
   *  well-formed known entity (caller emits a literal `&`). */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    if (i + 1 >= s.length) return null
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val digitsStart = j
      var cp = 0L
      while (j < s.length && j - digitsStart < 7 && {
        val c = s.charAt(j)
        if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
        else c >= '0' && c <= '9'
      }) {
        val c = s.charAt(j)
        val d = if (c <= '9') c - '0'
          else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10
        cp = cp * (if (hex) 16 else 10) + d
        j += 1
      }
      if (j == digitsStart || j >= s.length || s.charAt(j) != ';') return null
      if (cp < 1 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return null
      (new String(Character.toChars(cp.toInt)), j + 1)
    } else {
      var j = i + 1
      while (j < s.length && j - i <= 10 && isNameChar(s.charAt(j))) j += 1
      if (j >= s.length || s.charAt(j) != ';' || j == i + 1) return null
      NamedEntities.get(s.substring(i + 1, j)) match {
        case Some(text) => (text, j + 1)
        case None => null
      }
    }
  }

  /** Extract renderable text from an HTML document per the rule set in
   *  the object Scaladoc. Null-safe at the expression layer, not here. */
  def extractText(html: String): String = {
    val s = html
    val out = new java.lang.StringBuilder(s.length / 2 + 16)
    // '\n' in `out` means BLOCK BREAK only: raw source whitespace (incl.
    // newlines and NBSP, and whitespace produced by entity decode) is
    // appended as plain spaces so it collapses instead of breaking lines
    def appendText(t: String): Unit = {
      var m = 0
      while (m < t.length) {
        val tc = t.charAt(m)
        out.append(if (Character.isWhitespace(tc) || tc == ' ') ' ' else tc)
        m += 1
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 1 >= s.length) { out.append('<'); i += 1 }
        else {
          val c1 = s.charAt(i + 1)
          if (c1 == '!') {
            if (s.startsWith("<!--", i)) {
              val end = s.indexOf("-->", i + 4)
              i = if (end < 0) s.length else end + 3
            } else if (s.startsWith("<![CDATA[", i)) {
              val end = s.indexOf("]]>", i + 9)
              i = if (end < 0) s.length else end + 3
            } else {
              val end = s.indexOf('>', i + 2)
              i = if (end < 0) s.length else end + 1
            }
          } else if (c1 == '?') {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) s.length else end + 1
          } else if (c1 == '/' || isNameStart(c1)) {
            val nameStart = if (c1 == '/') i + 2 else i + 1
            var j = nameStart
            while (j < s.length && isNameChar(s.charAt(j))) j += 1
            if (j == nameStart) {
              // "</>" or "< x" — not a tag name; treat as a malformed
              // tag and drop through the quote-aware skipper
              i = skipTag(s, nameStart)
            } else {
              val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
              val afterTag = skipTag(s, j)
              if (c1 != '/' && (name == "script" || name == "style")) {
                val close = rawTextClose(s, name, afterTag)
                i = if (close < 0) s.length else skipTag(s, close + 2 + name.length)
              } else {
                if (BlockTags.contains(name)) out.append('\n')
                i = afterTag
              }
            }
          } else { out.append('<'); i += 1 }
        }
      } else if (c == '&') {
        val dec = decodeEntity(s, i)
        if (dec == null) { out.append('&'); i += 1 }
        else { appendText(dec._1); i = dec._2 }
      } else {
        out.append(if (Character.isWhitespace(c) || c == '\u00a0') ' ' else c)
        i += 1
      }
    }
    // renderer-style whitespace normalization: block breaks are the ONLY
    // line structure; all other whitespace (incl. raw newlines and NBSP)
    // collapses to single spaces within a line
    val lines = mutable.ArrayBuffer.empty[String]
    val line = new java.lang.StringBuilder(128)
    var pendingSpace = false
    def flushLine(): Unit = {
      if (line.length > 0) { lines += line.toString; line.setLength(0) }
      pendingSpace = false
    }
    var k = 0
    while (k < out.length) {
      val c = out.charAt(k)
      if (c == '\n') flushLine()
      else if (Character.isWhitespace(c) || c == '\u00a0') {
        if (line.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { line.append(' '); pendingSpace = false }
        line.append(c)
      }
      k += 1
    }
    flushLine()
    lines.mkString("\n")
  }

  // ------------------------------------------------------- main content

  /** Containers whose whole SUBTREE is page chrome, not content — the
   *  pruning trafilatura applies before scoring. `head` additionally
   *  auto-closes at `<body>` (the browser's implicit-close rule), so a
   *  page without `</head>` still yields its body. */
  val PruneTags: Seq[String] = Seq("head", "header", "nav", "aside", "footer")

  /** One scored text block of [[mainContent]]'s segmentation. Char
   *  counts are NON-WHITESPACE chars (whitespace collapse can't change
   *  them, so an oracle can count them on the source text). */
  final case class MainBlock(text: String, nWords: Int, nChars: Int,
      linkChars: Int, isHeading: Boolean, kept: Boolean)

  /** Main-content extraction — the boilerplate-aware tier published
   *  recipes run where a bare tag-strip keeps nav/footer junk
   *  (RefinedWeb: trafilatura; FineWeb likewise; jusText is the classic
   *  block-scoring formulation). Deterministic simplification of those
   *  recipes, documented so an oracle can replay it:
   *
   *   1. SUBTREE PRUNING: text inside [[PruneTags]] containers
   *      (head/header/nav/aside/footer, nesting-aware) is dropped whole.
   *   2. BLOCK SEGMENTATION: remaining text splits at [[BlockTags]]
   *      boundaries exactly like [[extractText]] lines; a block opened
   *      by `h1`–`h6` is a HEADING block.
   *   3. LINK DENSITY: per block, non-whitespace chars contributed
   *      inside `<a>` elements vs total; a block with
   *      `linkChars * 1e6 > maxLinkPpm * nChars` is boilerplate
   *      (nav-like). Integer ppm — no FP in the decision.
   *   4. LENGTH: a surviving block is GOOD iff `nWords >= minWords`;
   *      a shorter HEADING block is promoted iff the next non-empty
   *      block is GOOD (jusText's heading rescue); other short blocks
   *      drop.
   *
   *  Returns kept blocks joined with `\n`. 100 TB shape: identical to
   *  [[extractText]] — one linear scan per row fused into the scan
   *  stage via [[org.apache.spark.sql.graft.HtmlMainExtract]], zero
   *  shuffle. */
  def mainContent(html: String, minWords: Int = 10,
      maxLinkPpm: Int = 330000): String =
    mainBlocks(html, minWords, maxLinkPpm)
      .iterator.filter(_.kept).map(_.text).mkString("\n")

  /** The scored block list behind [[mainContent]] — the audit face
   *  (spec-level introspection of rule decisions). */
  def mainBlocks(html: String, minWords: Int = 10,
      maxLinkPpm: Int = 330000): Seq[MainBlock] = {
    val s = html
    // raw per-block accumulation: text with source whitespace mapped to
    // ' ' (collapsed at block finalization), plus non-ws char counters
    final class Acc(val isHeading: Boolean) {
      val sb = new java.lang.StringBuilder(64)
      var nChars = 0
      var linkChars = 0
    }
    val accs = mutable.ArrayBuffer.empty[Acc]
    var cur = new Acc(false)
    def cut(heading: Boolean): Unit = {
      accs += cur
      cur = new Acc(heading)
    }
    val pruneDepth = new Array[Int](PruneTags.length)
    def pruned: Boolean = {
      var i = 0
      while (i < pruneDepth.length) {
        if (pruneDepth(i) > 0) return true
        i += 1
      }
      false
    }
    var aDepth = 0
    def appendText(t: String): Unit = if (!pruned) {
      var m = 0
      while (m < t.length) {
        val tc = t.charAt(m)
        if (Character.isWhitespace(tc) || tc == ' ') cur.sb.append(' ')
        else {
          cur.sb.append(tc)
          cur.nChars += 1
          if (aDepth > 0) cur.linkChars += 1
        }
        m += 1
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 1 >= s.length) { appendText("<"); i += 1 }
        else {
          val c1 = s.charAt(i + 1)
          if (c1 == '!') {
            if (s.startsWith("<!--", i)) {
              val end = s.indexOf("-->", i + 4)
              i = if (end < 0) s.length else end + 3
            } else if (s.startsWith("<![CDATA[", i)) {
              val end = s.indexOf("]]>", i + 9)
              i = if (end < 0) s.length else end + 3
            } else {
              val end = s.indexOf('>', i + 2)
              i = if (end < 0) s.length else end + 1
            }
          } else if (c1 == '?') {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) s.length else end + 1
          } else if (c1 == '/' || isNameStart(c1)) {
            val isClose = c1 == '/'
            val nameStart = if (isClose) i + 2 else i + 1
            var j = nameStart
            while (j < s.length && isNameChar(s.charAt(j))) j += 1
            if (j == nameStart) i = skipTag(s, nameStart)
            else {
              val name =
                s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
              val afterTag = skipTag(s, j)
              if (!isClose && (name == "script" || name == "style")) {
                val close = rawTextClose(s, name, afterTag)
                i = if (close < 0) s.length
                    else skipTag(s, close + 2 + name.length)
              } else {
                val pi = PruneTags.indexOf(name)
                if (pi >= 0) {
                  if (isClose) {
                    if (pruneDepth(pi) > 0) pruneDepth(pi) -= 1
                  } else pruneDepth(pi) += 1
                }
                // browsers auto-close <head> when <body> opens
                if (!isClose && name == "body") pruneDepth(0) = 0
                if (name == "a") {
                  // HTML5: a new <a> start tag implicitly closes any
                  // active anchor (anchors never nest), so an unclosed
                  // <a> cannot inflate the depth and poison every later
                  // block's link-density verdict
                  if (isClose) aDepth = 0 else aDepth = 1
                }
                if (BlockTags.contains(name))
                  cut(!isClose && name.length == 2 && name.charAt(0) == 'h' &&
                    name.charAt(1) >= '1' && name.charAt(1) <= '6')
                i = afterTag
              }
            }
          } else { appendText("<"); i += 1 }
        }
      } else if (c == '&') {
        val dec = decodeEntity(s, i)
        if (dec == null) { appendText("&"); i += 1 }
        else { appendText(dec._1); i = dec._2 }
      } else {
        appendText(String.valueOf(c))
        i += 1
      }
    }
    cut(false)
    // collapse whitespace per block, then classify
    val blocks = accs.map { acc =>
      val raw = acc.sb
      val line = new java.lang.StringBuilder(raw.length)
      var pendingSpace = false
      var k = 0
      while (k < raw.length) {
        val ch = raw.charAt(k)
        if (ch == ' ') { if (line.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { line.append(' '); pendingSpace = false }
          line.append(ch)
        }
        k += 1
      }
      val text = line.toString
      val nWords = if (text.isEmpty) 0 else {
        var w = 1; var m = 0
        while (m < text.length) { if (text.charAt(m) == ' ') w += 1; m += 1 }
        w
      }
      (text, nWords, acc.nChars, acc.linkChars, acc.isHeading)
    }
    def linkOk(nChars: Int, linkChars: Int): Boolean =
      nChars > 0 && linkChars * 1000000L <= maxLinkPpm.toLong * nChars
    def good(b: (String, Int, Int, Int, Boolean)): Boolean =
      linkOk(b._3, b._4) && b._2 >= minWords
    val out = Seq.newBuilder[MainBlock]
    var bi = 0
    while (bi < blocks.length) {
      val b = blocks(bi)
      val kept =
        if (good(b)) true
        else if (b._5 && linkOk(b._3, b._4) && b._2 >= 1) {
          // heading rescue: next non-empty block must be GOOD
          var ni = bi + 1
          while (ni < blocks.length && blocks(ni)._3 == 0) ni += 1
          ni < blocks.length && good(blocks(ni))
        } else false
      if (b._3 > 0) out += MainBlock(b._1, b._2, b._3, b._4, b._5, kept)
      bi += 1
    }
    out.result()
  }

  // ------------------------------------------------------------- tables

  /**
   * Structured TABLE extraction — the other half of web mining: while
   * [[extractText]] linearizes a page, `extractTables` recovers
   * `<table>` content as tables -> rows -> cells (each cell text
   * extracted under the same entity/inline-tag/whitespace rules).
   * Deterministic simplifications, documented for the oracle: `<td>` /
   * `<th>` are equivalent; an unclosed cell closes at the next cell /
   * row / table boundary (the browser's implicit-close rule);
   * `colspan` / `rowspan` are ignored (cells land at their source
   * position); a NESTED table becomes its own entry in the result list
   * and contributes no text to the outer cell; rows with zero cells
   * drop. Tables are listed in document order of their `</table>`
   * (inner-first for nested).
   *
   * 100 TB shape: per-row linear scan like [[extractText]], exploded
   * to (table, row) rows partition-locally — no shuffle in extraction.
   */
  def extractTables(html: String): Seq[Seq[Seq[String]]] = {
    val s = html
    val done = mutable.ArrayBuffer.empty[Seq[Seq[String]]]
    // stack of open tables: each is (rows, currentRow, currentCell|null)
    final class T {
      val rows = mutable.ArrayBuffer.empty[Seq[String]]
      var row: mutable.ArrayBuffer[String] = null
      var cell: java.lang.StringBuilder = null
    }
    val stack = mutable.ArrayBuffer.empty[T]
    def top: T = stack.last
    def closeCell(): Unit = if (stack.nonEmpty && top.cell != null) {
      // renderer-style collapse inside the cell
      val raw = top.cell.toString
      val b = new java.lang.StringBuilder(raw.length)
      var pend = false
      var m = 0
      while (m < raw.length) {
        val c = raw.charAt(m)
        if (Character.isWhitespace(c) || c == '\u00a0') {
          if (b.length > 0) pend = true
        } else {
          if (pend) { b.append(' '); pend = false }
          b.append(c)
        }
        m += 1
      }
      if (top.row == null) top.row = mutable.ArrayBuffer.empty[String]
      top.row += b.toString
      top.cell = null
    }
    def closeRow(): Unit = if (stack.nonEmpty) {
      closeCell()
      if (top.row != null && top.row.nonEmpty) top.rows += top.row.toSeq
      top.row = null
    }
    def text(t: String): Unit =
      if (stack.nonEmpty && top.cell != null) top.cell.append(t)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 1 >= s.length) { text("<"); i += 1 }
        else {
          val c1 = s.charAt(i + 1)
          if (c1 == '!') {
            if (s.startsWith("<!--", i)) {
              val end = s.indexOf("-->", i + 4)
              i = if (end < 0) s.length else end + 3
            } else if (s.startsWith("<![CDATA[", i)) {
              val end = s.indexOf("]]>", i + 9)
              i = if (end < 0) s.length else end + 3
            } else {
              val end = s.indexOf('>', i + 2)
              i = if (end < 0) s.length else end + 1
            }
          } else if (c1 == '?') {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) s.length else end + 1
          } else if (c1 == '/' || isNameStart(c1)) {
            val nameStart = if (c1 == '/') i + 2 else i + 1
            var j = nameStart
            while (j < s.length && isNameChar(s.charAt(j))) j += 1
            if (j == nameStart) i = skipTag(s, nameStart)
            else {
              val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
              val afterTag = skipTag(s, j)
              if (c1 != '/' && (name == "script" || name == "style")) {
                val close = rawTextClose(s, name, afterTag)
                i = if (close < 0) s.length
                    else skipTag(s, close + 2 + name.length)
              } else {
                (c1 == '/', name) match {
                  case (false, "table") => stack += new T
                  case (true, "table") => if (stack.nonEmpty) {
                    closeRow()
                    done += top.rows.toSeq
                    stack.remove(stack.length - 1)
                  }
                  case (false, "tr") => closeRow()
                  case (true, "tr") => closeRow()
                  case (false, "td" | "th") => if (stack.nonEmpty) {
                    closeCell()
                    if (top.row == null) top.row = mutable.ArrayBuffer.empty[String]
                    top.cell = new java.lang.StringBuilder(32)
                  }
                  case (true, "td" | "th") => closeCell()
                  case _ =>
                    if (BlockTags.contains(name)) text(" ")
                }
                i = afterTag
              }
            }
          } else { text("<"); i += 1 }
        }
      } else if (c == '&') {
        val dec = decodeEntity(s, i)
        if (dec == null) { text("&"); i += 1 }
        else { text(dec._1); i = dec._2 }
      } else {
        text(String.valueOf(c))
        i += 1
      }
    }
    // unterminated tables still flush (truncated crawls are normal)
    while (stack.nonEmpty) {
      closeRow()
      done += top.rows.toSeq
      stack.remove(stack.length - 1)
    }
    done.toSeq
  }

  /** Explode an HTML column into one output row per TABLE ROW:
   *  (kept cols..., table_idx, row_idx, n_cells, cells). Partition-local
   *  1:N; pages without tables contribute nothing. */
  def tables(df: org.apache.spark.sql.DataFrame,
      htmlCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val htmlIdx = inSchema.fieldIndex(htmlCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != htmlIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("table_idx", IntegerType, nullable = false),
      StructField("row_idx", IntegerType, nullable = false),
      StructField("n_cells", LongType, nullable = false),
      StructField("cells", ArrayType(StringType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        require(!r.isNullAt(htmlIdx),
          s"null $htmlCol value — filter nulls before table extraction")
        extractTables(r.getString(htmlIdx)).zipWithIndex.flatMap {
          case (tbl, ti) => tbl.zipWithIndex.map { case (cells, ri) =>
            Row.fromSeq(keptIdx.toSeq.map(r.get) ++
              Seq[Any](ti, ri, cells.length.toLong, cells))
          }
        }
      }
    }(encoder)
  }
}
