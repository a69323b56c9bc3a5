package graft

import graft.operators.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** sitemaps.org protocol walk: urlset + sitemapindex, entity decode,
 *  priority in milli units, malformed tolerance, Spark explode. */
class SitemapSpec extends AnyFunSuite {

  test("urlset: loc/lastmod/changefreq/priority per url, XML entities " +
      "decode, comments and CDATA skip, loc-less entries drop") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<!-- generated -->
        |<url><loc>https://x.test/a&amp;b</loc>
        |  <lastmod>2026-02-03</lastmod><priority>0.8</priority></url>
        |<url><loc>https://x.test/c</loc><changefreq>daily</changefreq></url>
        |<url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val es = Sitemap.parse(xml)
    assert(es.length == 2)
    assert(es(0) == Sitemap.Entry("url", "https://x.test/a&b",
      "2026-02-03", "", 800L))
    assert(es(1) == Sitemap.Entry("url", "https://x.test/c", "",
      "daily", -1L))
  }

  test("sitemapindex: shard pointers come back with kind 'sitemap'; a " +
      "bad priority is -1") {
    val xml =
      """<sitemapindex>
        |<sitemap><loc>https://x.test/s1.xml</loc>
        |  <lastmod>2026-01-05T12:00:00Z</lastmod></sitemap>
        |<sitemap><loc>https://x.test/s2.xml</loc>
        |  <priority>high</priority></sitemap>
        |</sitemapindex>""".stripMargin
    val es = Sitemap.parse(xml)
    assert(es.map(_.kind) == Seq("sitemap", "sitemap"))
    assert(es(0).lastmod == "2026-01-05T12:00:00Z")
    assert(es(1).priorityMilli == -1L)
  }

  test("entries(): Spark 1:N explode keeps keys and orders entries") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val xml = "<urlset><url><loc>u1</loc></url><url><loc>u2</loc>" +
      "<priority>0.25</priority></url></urlset>"
    val df = Seq((7L, xml)).toDF("id", "xml")
    val got = Sitemap.entries(df, "xml")
      .select("id", "entry_idx", "kind", "loc", "priority_milli")
      .as[(Long, Int, String, String, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq(
      (7L, 0, "url", "u1", -1L),
      (7L, 1, "url", "u2", 250L)))
  }
}
