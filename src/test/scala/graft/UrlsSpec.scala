package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule pins for URL canonicalization + registered domain —
 *  edge cases the synthetic driver URLs don't reach. */
class UrlsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def c(u: String): String = Urls.canonicalizeUrl(u)

  test("scheme/host lowercase, default port strip, explicit port kept") {
    assert(c("HTTP://WWW.Example.COM/") == "http://www.example.com/")
    assert(c("https://Example.com:443/x") == "https://example.com/x")
    assert(c("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(c("http://example.com:/x") == "http://example.com/x")
    assert(c("ftp://Files.Example.org:21/a") == "ftp://files.example.org/a")
    // empty path -> "/"
    assert(c("https://example.com") == "https://example.com/")
    assert(c("https://example.com?a=1") == "https://example.com/?a=1")
  }

  test("dot-segment resolution: ., .., above-root, trailing, dup slashes") {
    assert(c("http://h.co/a/./b/../c") == "http://h.co/a/c")
    assert(c("http://h.co/../../x") == "http://h.co/x")
    assert(c("http://h.co/a/b/..") == "http://h.co/a/")
    assert(c("http://h.co/a/.") == "http://h.co/a/")
    // RFC 3986 remove_dot_segments PRESERVES empty segments: '/a//b'
    // and '/a/b' are distinct resources (key-merging them would conflate
    // crawl-dedup keys, the same risk that forbids percent-decoding)
    assert(c("http://h.co/a//b///c") == "http://h.co/a//b///c")
    assert(c("http://h.co/a/") == "http://h.co/a/")
    assert(c("http://h.co/..") == "http://h.co/")
  }

  test("tracking params drop (case-insensitive, prefix + exact), order kept") {
    assert(c("http://h.co/?utm_source=a&id=1&UTM_Medium=b&q=2") ==
      "http://h.co/?id=1&q=2")
    assert(c("http://h.co/p?gclid=x&FBCLID=y") == "http://h.co/p")
    assert(c("http://h.co/p?a=1&&b=2") == "http://h.co/p?a=1&b=2")
    assert(c("http://h.co/p?utm=keepme") == "http://h.co/p?utm=keepme")
    assert(c("http://h.co/p?ref_src=tw") == "http://h.co/p")
  }

  test("fragment drops; userinfo and percent-escapes verbatim; IPv6 port") {
    assert(c("http://h.co/a#frag") == "http://h.co/a")
    assert(c("http://User@H.co/a") == "http://User@h.co/a")
    assert(c("http://h.co/a%2Fb?x=%20") == "http://h.co/a%2Fb?x=%20")
    assert(c("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:8080/x") == "http://[2001:db8::1]:8080/x")
  }

  test("non-absolute strings pass through trimmed; punycode untouched") {
    assert(c("  not a url  ") == "not a url")
    assert(c("mailto:a@b.co") == "mailto:a@b.co")
    assert(c("//proto-relative.example/x") == "//proto-relative.example/x")
    assert(c("https://XN--BCHER-KVA.example/x") == "https://xn--bcher-kva.example/x")
  }

  test("registeredDomain: two-label, multi-label suffix, IPs, edge shapes") {
    assert(Urls.registeredDomain("www.example.com") == "example.com")
    assert(Urls.registeredDomain("a.b.example.co.uk") == "example.co.uk")
    assert(Urls.registeredDomain("example.co.uk") == "example.co.uk")
    assert(Urls.registeredDomain("co.uk") == "co.uk")
    assert(Urls.registeredDomain("localhost") == "localhost")
    assert(Urls.registeredDomain("192.168.0.1") == "192.168.0.1")
    assert(Urls.registeredDomain("[2001:db8::1]") == "[2001:db8::1]")
    assert(Urls.registeredDomain("example.com.") == "example.com")
    assert(Urls.registeredDomain("sub.deep.example.org") == "example.org")
  }

  test("column faces + builtin:url_canon lens reach the operator") {
    val df = Seq((1L, "HTTP://A.Example.COM:80/x/./y?utm_source=f&k=v#z"))
      .toDF("id", "url")
    val got = df.select(
      org.apache.spark.sql.graft.Url.canonicalize(col("url")).as("c"))
      .as[String].head()
    assert(got == "http://a.example.com/x/y?k=v")
    val pipe = graft.engine.Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:url_canon","arguments":{"col":"url"}}]}""")
    assert(pipe.forward(df).select("url").as[String].head() ==
      "http://a.example.com/x/y?k=v")
    val rd = df.select(org.apache.spark.sql.graft.Url.registeredDomain(
      lit("x.y.site.co.uk")).as("d")).as[String].head()
    assert(rd == "site.co.uk")
  }
}
