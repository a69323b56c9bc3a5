package graft

import graft.operators.Pdf
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF text-extraction tier: writer→extractor round trips (both filter
 *  paths), full literal-string escape matrix, hex strings, metadata,
 *  and the named-failure contract for everything outside the honest
 *  subset. */
class PdfSpec extends AnyFunSuite {

  test("round trip: pages, title, text and op counts survive both the " +
      "FlateDecode and unfiltered stream paths") {
    for (compress <- Seq(true, false)) {
      val pdf = Pdf.encodePdf(Seq("hello world", "page two here"),
        title = "My Title", compress = compress)
      assert(Pdf.isPdf(pdf))
      val (pages, title, ops, text) = Pdf.extractText(pdf)
      assert(pages == 2 && title == "My Title" && ops == 2)
      assert(text == "hello world\npage two here")
    }
  }

  test("no /Info: title empty; single page; op count exact") {
    val (pages, title, ops, text) =
      Pdf.extractText(Pdf.encodePdf(Seq("only page")))
    assert(pages == 1 && title == "" && ops == 1 && text == "only page")
  }

  test("literal-string escapes round-trip: parens (nested + escaped), " +
      "backslash, newline/tab, octal for Latin-1 high bytes") {
    val hairy = "a(b)c \\ d\ne\tf " + "café ÿ" + " (x(y)z)"
    val (_, _, _, text) = Pdf.extractText(Pdf.encodePdf(Seq(hairy)))
    assert(text == hairy)
    // title goes through the same escaper
    val (_, t2, _, _) = Pdf.extractText(
      Pdf.encodePdf(Seq("x"), title = "90% (ish) \\ done"))
    assert(t2 == "90% (ish) \\ done")
  }

  test("hex strings and TJ arrays extract through a hand-built " +
      "content stream; text outside BT..ET is ignored") {
    val content = ("(ignored outside) Tj " +
      "BT <48656c6c6f> Tj [(a) -120 (b)] TJ (line) ' ET " +
      "(also ignored) Tj").getBytes(ISO_8859_1)
    // wrap it in a one-page pdf by patching the encoder's output shape:
    // build a minimal file by hand around the stream
    val body = new StringBuilder
    body.append("%PDF-1.4\n")
    body.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    body.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    body.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    body.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    val pdf = (body.toString.getBytes(ISO_8859_1) ++ content ++
      "\nendstream\nendobj\ntrailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
        .getBytes(ISO_8859_1))
    val (pages, _, ops, text) = Pdf.extractText(pdf)
    assert(pages == 1 && ops == 3)
    assert(text == "Helloab\nline")
  }

  test("a `stream` keyword inside a dict string cannot desync the " +
      "object walk (balanced-dict scan)") {
    val pdf = Pdf.encodePdf(Seq("body"), title = "all about stream things")
    val (pages, title, _, text) = Pdf.extractText(pdf)
    assert(pages == 1 && title == "all about stream things" &&
      text == "body")
  }

  test("named failures: non-PDF, encrypted, unsupported filter, " +
      "indirect /Length, overrun /Length, truncated flate, CID text " +
      "at the encoder") {
    def named(body: => Any, expect: String): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    named(Pdf.extractText("not a pdf at all".getBytes(ISO_8859_1)),
      "%PDF-")
    val base = new String(Pdf.encodePdf(Seq("x"), "t"), ISO_8859_1)
    named(Pdf.extractText(base.replace("/Size", "/Encrypt 9 0 R /Size")
      .getBytes(ISO_8859_1)), "Encrypt")
    named(Pdf.extractText(base.replace("/Filter /FlateDecode",
      "/Filter /LZWDecode").getBytes(ISO_8859_1)), "unsupported filter")
    // direct length replaced by an indirect reference
    named(Pdf.extractText(
      "%PDF-1.4\n1 0 obj\n<< /Length 9 0 R >>\nstream\nxx\nendstream\nendobj\n"
        .getBytes(ISO_8859_1)), "direct /Length")
    named(Pdf.extractText(
      "%PDF-1.4\n1 0 obj\n<< /Length 99999 >>\nstream\nxx"
        .getBytes(ISO_8859_1)), "overruns")
    // flate stream cut short: shrink the declared /Length so the
    // inflater sees 4 bytes of a real zlib stream
    val good = Pdf.encodePdf(Seq("a reasonably long page body string"))
    val s = new String(good, ISO_8859_1)
    val lenRe = "/Length (\\d+) /Filter".r
    val decl = lenRe.findFirstMatchIn(s).get.group(1)
    named(Pdf.extractText(s.replace(s"/Length $decl /Filter",
      "/Length 4 /Filter").getBytes(ISO_8859_1)), "truncated FlateDecode")
    named(Pdf.encodePdf(Seq("中文")), "CID font")
  }
}
