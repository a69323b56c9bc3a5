package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/**
 * PDF text-extraction tier — the DOCUMENT triage codec (a real crawl
 * is a few percent `application/pdf`, and corpus pipelines route those
 * through text extraction exactly like HTML goes through
 * [[Html HtmlText]]). Honest subset, every exclusion a NAMED error:
 *
 *  - Body walk is a LINEAR object scan (`N G obj … endobj`, stream
 *    bytes skipped via the dict's direct /Length), not an xref chase:
 *    the robust path for triage — it reads updated/appended files and
 *    xref-stream (PDF 1.5+) bodies alike. The classic `trailer` dict
 *    still resolves /Info metadata when present.
 *  - Streams: /FlateDecode (JDK Inflater, inflate capped at 2^24 per
 *    stream) or unfiltered. Other filters reject by name.
 *  - Text: BT…ET blocks of simple-font show operators — Tj, ', ", and
 *    TJ arrays — with literal strings (nesting, all spec escapes,
 *    octal) and hex strings decoding as Latin-1 byte text. CID/Type0
 *    composite-font text would need the font's ToUnicode CMap and
 *    rejects by name at the ENCODER (the fixture side); the extractor
 *    surfaces whatever simple-font bytes say, which is the faithful
 *    triage contract for the overwhelming Helvetica/Times tail.
 *  - Encrypted documents (/Encrypt in the trailer) reject by name.
 *
 * 100 TB shape: per-payload linear decode inside a narrow
 * mapPartitions, identical to every other codec here — blobs never
 * shuffle, extracted text rows do.
 *
 * Reference has no document codecs (north-star addition, mandated by
 * BASELINE.json's multimodal family).
 */
object Pdf {

  private val MaxInflate = 1 << 24
  private val MaxObjects = 1 << 16

  def isPdf(p: Array[Byte]): Boolean =
    p.length >= 7 && p(0) == '%' && p(1) == 'P' && p(2) == 'D' &&
      p(3) == 'F' && p(4) == '-'

  // ------------------------------------------------------------ encoder

  /** Deterministic single-font fixture writer: one content stream per
   *  page (`BT /F1 12 Tf 72 720 Td (text) Tj ET`), Helvetica, optional
   *  /Info /Title, FlateDecode-compressed streams when `compress`,
   *  classic xref table with exact byte offsets. Text outside Latin-1
   *  rejects by name (a CID font would be required). */
  def encodePdf(pages: Seq[String], title: String = "",
      compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty && pages.size <= 4096,
      s"encodePdf: ${pages.size} pages outside [1, 4096]")
    (pages :+ title).foreach(s => s.foreach(c =>
      require(c <= 'ÿ',
        f"encodePdf: code point U+${c.toInt}%04X needs a CID font " +
          "(only Latin-1 simple-font text is supported)")))
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      w(s"${offsets.size} 0 obj\n"); body; w("endobj\n")
    }
    val nPages = pages.size
    val fontObj = 3 + 2 * nPages
    val infoObj = if (title.nonEmpty) Some(fontObj + 1) else None

    w("%PDF-1.4\n%")
    // the spec-recommended 4 high bytes marking the file binary
    out.write(Array(0xE2, 0xE3, 0xCF, 0xD3).map(_.toByte), 0, 4)
    w("\n")
    obj { w(s"<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj {
      val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R")
      w(s"<< /Type /Pages /Kids [${kids.mkString(" ")}] " +
        s"/Count $nPages >>\n")
    }
    pages.zipWithIndex.foreach { case (text, i) =>
      obj {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Contents ${4 + 2 * i} 0 R " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>\n")
      }
      obj {
        val content =
          s"BT /F1 12 Tf 72 720 Td (${escapeLiteral(text)}) Tj ET"
            .getBytes(ISO_8859_1)
        val bytes = if (compress) deflate(content) else content
        val filter = if (compress) " /Filter /FlateDecode" else ""
        w(s"<< /Length ${bytes.length}$filter >>\nstream\n")
        out.write(bytes, 0, bytes.length)
        w("\nendstream\n")
      }
    }
    obj {
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    }
    infoObj.foreach { _ =>
      obj { w(s"<< /Title (${escapeLiteral(title)}) >>\n") }
    }
    val xrefAt = out.size()
    val n = offsets.size
    w(s"xref\n0 ${n + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${n + 1} /Root 1 0 R" +
      infoObj.map(i => s" /Info $i 0 R").getOrElse("") +
      s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def escapeLiteral(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c >= ' ' && c <= '~' => b.append(c)
      case c => b.append(f"\\${c.toInt}%03o")
    }
    b.toString
  }

  private def deflate(p: Array[Byte]): Array[Byte] = {
    val d = ZlibPool.zlibDeflater() // reused thread-local, reset — output
    d.setInput(p); d.finish()       // bytes identical to a fresh instance
    val out = new ByteArrayOutputStream(p.length / 2 + 16)
    val buf = ZlibPool.scratch()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  private def inflate(p: Array[Byte], what: String): Array[Byte] = {
    val inf = ZlibPool.zlibInflater()
    inf.setInput(p)
    val out = new ByteArrayOutputStream(math.min(p.length * 4 + 64, 1 << 16))
    val buf = ZlibPool.scratch()
    try {
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"$what: corrupt FlateDecode stream (${e.getMessage})")
          }
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException(
            s"$what: truncated FlateDecode stream")
        out.write(buf, 0, n)
        if (out.size() > MaxInflate)
          throw new IllegalArgumentException(
            s"$what: FlateDecode output exceeds the $MaxInflate-byte cap")
      }
    } finally inf.reset() // pooled: release input reference, never end()
    out.toByteArray
  }

  // ------------------------------------------------------------ decoder

  /** One parsed indirect object: raw dict text + stream bytes. */
  private final case class PObj(num: Int, dict: String,
      stream: Option[Array[Byte]])

  /** Extracted document: (page_count, title, n_text_ops, text) — pages
   *  joined with a single newline, text ops counted across all content
   *  streams (Tj / ' / " / TJ). */
  def extractText(p: Array[Byte]): (Int, String, Int, String) = {
    require(isPdf(p), "extractText: missing %PDF- header")
    val s = new String(p, ISO_8859_1)
    val objs = scanObjects(p, s)
    val byNum = objs.map(o => o.num -> o).toMap
    val trailerDict = lastTrailerDict(s)
    trailerDict.foreach { t =>
      require(!t.contains("/Encrypt"),
        "extractText: encrypted document (/Encrypt) is not supported")
    }
    val title = (for {
      t <- trailerDict
      m <- "/Info\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(t)
      info <- byNum.get(m.group(1).toInt)
      lit <- firstLiteral(info.dict, "/Title")
    } yield lit).getOrElse("")
    // page objects in document order; their /Contents refs in order
    val pageObjs = objs.filter(o => dictType(o.dict) == "Page")
    val pageCount = pageObjs.size
    var nOps = 0
    val pageTexts = pageObjs.map { pg =>
      val refs = "/Contents\\s+(\\d+)\\s+\\d+\\s+R".r
        .findAllMatchIn(pg.dict).map(_.group(1).toInt).toSeq ++
        "/Contents\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(pg.dict).toSeq
          .flatMap(m => "(\\d+)\\s+\\d+\\s+R".r
            .findAllMatchIn(m.group(1)).map(_.group(1).toInt))
      val content = refs.flatMap(byNum.get).flatMap(_.stream) match {
        case ss if ss.nonEmpty => ss.reduce(_ ++ _)
        case _ => Array.emptyByteArray
      }
      val (txt, ops) = showText(content)
      nOps += ops
      txt
    }
    (pageCount, title, nOps, pageTexts.mkString("\n"))
  }

  /** Linear `obj … endobj` scan; the dict end is found by BALANCED
   *  `<< >>` nesting (so a `stream` keyword inside a string cannot
   *  desync the walk) and stream bytes are skipped via the direct
   *  /Length so binary content cannot either. */
  private def scanObjects(p: Array[Byte], s: String): Seq[PObj] = {
    val objM = java.util.regex.Pattern
      .compile("(\\d+)\\s+(\\d+)\\s+obj\\b").matcher(s)
    val out = Seq.newBuilder[PObj]
    var at = 0
    var count = 0
    def dictEnd(open: Int): Int = {
      var depth = 0
      var i = open
      while (i < s.length - 1) {
        if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
          depth += 1; i += 2
        } else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
          depth -= 1; i += 2
          if (depth == 0) return i
        } else i += 1
      }
      throw new IllegalArgumentException("pdf: unbalanced dictionary")
    }
    while (at < s.length && objM.find(at)) {
      count += 1
      if (count > MaxObjects) throw new IllegalArgumentException(
        s"pdf: more than $MaxObjects indirect objects")
      val num = objM.group(1).toInt
      var i = objM.end
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      val (dict, bodyEnd) =
        if (i + 1 < s.length && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
          val e = dictEnd(i)
          (s.substring(i, e), e)
        } else {
          val e = s.indexOf("endobj", i)
          if (e < 0) throw new IllegalArgumentException(
            s"pdf: object $num without endobj")
          (s.substring(i, e), e)
        }
      var j = bodyEnd
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (s.startsWith("stream", j)) {
        val len = "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)".r
          .findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(
            throw new IllegalArgumentException(
              s"pdf: object $num stream without a direct /Length"))
        var ds = j + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        if (len < 0 || ds + len > p.length)
          throw new IllegalArgumentException(
            s"pdf: object $num /Length $len overruns the file")
        val raw = java.util.Arrays.copyOfRange(p, ds, ds + len)
        val data =
          if (dict.contains("/Filter")) {
            if (dict.contains("/FlateDecode"))
              inflate(raw, s"pdf object $num")
            else throw new IllegalArgumentException(
              s"pdf: object $num uses an unsupported filter " +
                "(only /FlateDecode)")
          } else raw
        val realEnd = s.indexOf("endobj", ds + len)
        if (realEnd < 0) throw new IllegalArgumentException(
          s"pdf: object $num stream without endobj")
        out += PObj(num, dict, Some(data))
        at = realEnd + "endobj".length
      } else {
        val e = s.indexOf("endobj", bodyEnd)
        if (e < 0) throw new IllegalArgumentException(
          s"pdf: object $num without endobj")
        out += PObj(num, dict, None)
        at = e + "endobj".length
      }
    }
    out.result()
  }

  private def dictType(dict: String): String =
    "/Type\\s*/(\\w+)".r.findFirstMatchIn(dict).map(_.group(1)).getOrElse("")

  private def lastTrailerDict(s: String): Option[String] = {
    val at = s.lastIndexOf("trailer")
    if (at < 0) None
    else {
      val open = s.indexOf("<<", at)
      if (open < 0) None
      else {
        var depth = 0
        var i = open
        while (i < s.length - 1) {
          if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
            depth += 1; i += 2
          } else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
            depth -= 1; i += 2
            if (depth == 0) return Some(s.substring(open, i))
          } else i += 1
        }
        None
      }
    }
  }

  /** First literal string following `key` in a dict. */
  private def firstLiteral(dict: String, key: String): Option[String] = {
    val at = dict.indexOf(key)
    if (at < 0) None
    else {
      val open = dict.indexOf('(', at + key.length)
      if (open < 0) None
      else {
        val bytes = dict.getBytes(ISO_8859_1)
        val (str, _) = literalAt(bytes, open)
        Some(str)
      }
    }
  }

  /** Parse a literal string at `(`: nesting, spec escapes, octal.
   *  Returns (decoded text, index after the closing paren). */
  private def literalAt(p: Array[Byte], open: Int): (String, Int) = {
    val b = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < p.length && depth > 0) {
      (p(i) & 0xFF) match {
        case '\\' =>
          if (i + 1 >= p.length) throw new IllegalArgumentException(
            "pdf: literal string ends inside an escape")
          val c = (p(i + 1) & 0xFF).toChar
          i += 2
          c match {
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case '(' | ')' | '\\' => b.append(c)
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && i < p.length &&
                  p(i) >= '0' && p(i) <= '7') {
                v = v * 8 + (p(i) - '0'); i += 1; k += 1
              }
              b.append((v & 0xFF).toChar)
            case '\n' => () // line continuation
            case '\r' => // continuation; swallow an optional LF
              if (i < p.length && p(i) == '\n') i += 1
            case other => b.append(other) // spec: drop the backslash
          }
        case '(' => depth += 1; b.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) b.append(')')
          i += 1
        case c => b.append(c.toChar); i += 1
      }
    }
    if (depth != 0) throw new IllegalArgumentException(
      "pdf: unbalanced literal string")
    (b.toString, i)
  }

  /** Walk one content stream for show-text operators inside BT…ET.
   *  Returns (text, n_show_ops). */
  private def showText(content: Array[Byte]): (String, Int) = {
    val out = new StringBuilder
    var ops = 0
    var inText = false
    var i = 0
    var pendingStrings = List.empty[String]
    def flush(prefix: String = ""): Unit = {
      if (inText) {
        ops += 1
        out.append(prefix)
        pendingStrings.reverse.foreach(out.append)
      }
      pendingStrings = Nil
    }
    while (i < content.length) {
      val c = content(i) & 0xFF
      if (c == '(') {
        val (str, next) = literalAt(content, i)
        pendingStrings ::= str
        i = next
      } else if (c == '<' &&
          (i + 1 >= content.length || content(i + 1) != '<')) {
        val close = {
          var j = i + 1
          while (j < content.length && content(j) != '>') j += 1
          if (j >= content.length) throw new IllegalArgumentException(
            "pdf: unterminated hex string")
          j
        }
        val hex = new String(content, i + 1, close - i - 1, ISO_8859_1)
          .filterNot(_.isWhitespace)
        require(hex.forall(h => Character.digit(h, 16) >= 0),
          "pdf: non-hex digit in hex string")
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        val b = new StringBuilder(padded.length / 2)
        padded.grouped(2).foreach(h =>
          b.append(Integer.parseInt(h, 16).toChar))
        pendingStrings ::= b.toString
        i = close + 1
      } else if (c == '%') { // comment to EOL
        while (i < content.length && content(i) != '\n') i += 1
      } else if (Character.isLetter(c) || c == '\'' || c == '"') {
        var j = i
        while (j < content.length && !isDelim(content(j))) j += 1
        val op = new String(content, i, j - i, ISO_8859_1)
        op match {
          case "BT" => inText = true; pendingStrings = Nil
          case "ET" => inText = false; pendingStrings = Nil
          case "Tj" | "TJ" => flush()
          case "'" => flush("\n")
          case "\"" => flush("\n")
          case "T*" => if (inText) out.append('\n')
          case _ => pendingStrings = Nil // non-show op consumes operands
        }
        i = j
      } else i += 1
    }
    (out.toString, ops)
  }

  private def isDelim(b: Byte): Boolean = {
    val c = b & 0xFF
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '(' ||
      c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '/' || c == '%' || c == 0
  }
}
