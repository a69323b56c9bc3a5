package graft

import graft.operators.Recrawl
import org.scalatest.funsuite.AnyFunSuite

/** Recrawl planning: staleness classes from the sitemap-vs-fetch-log
 *  join, overdue priorities, and the deterministic per-host pick. */
class RecrawlSpec extends AnyFunSuite {

  test("staleness classes, overdue priority, and the per-host " +
      "most-overdue pick with url tiebreak; hosts with nothing due " +
      "pick the empty url") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val declared = Seq(
      ("https://a.test/new", 900L), // never fetched -> new, overdue 900
      ("https://a.test/stale", 800L), // fetched at 700 -> stale, 100
      ("https://a.test/fresh", 500L), // fetched at 600 -> fresh
      ("https://b.test/t1", 300L), // ties: overdue 100 each ...
      ("https://b.test/t2", 300L), // ... url tiebreak picks t2 (max)
      ("https://c.test/ok", 100L) // fresh -> host c has nothing due
    ).toDF("url", "lastmod_ms")
    val fetched = Seq(
      ("https://a.test/stale", 700L),
      ("https://a.test/fresh", 600L),
      ("https://a.test/ghost", 50L), // fetched, never declared
      ("https://b.test/t1", 200L),
      ("https://b.test/t2", 200L),
      ("https://c.test/ok", 150L)
    ).toDF("url", "fetch_ms")
    val st = Recrawl.staleness(declared, "url", "lastmod_ms",
      fetched, "fetch_ms")
    val byUrl = st.select("url", "status", "overdue_ms", "lastmod_ms",
        "fetch_ms")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(byUrl("https://a.test/new")._2 == "new" &&
      byUrl("https://a.test/new")._3 == 900L)
    assert(byUrl("https://a.test/stale")._2 == "stale" &&
      byUrl("https://a.test/stale")._3 == 100L)
    assert(byUrl("https://a.test/fresh")._2 == "fresh" &&
      byUrl("https://a.test/fresh")._3 == 0L)
    assert(byUrl("https://a.test/ghost")._2 == "undeclared" &&
      byUrl("https://a.test/ghost")._4 == -1L)
    val plan = Recrawl.plan(st)
      .select("host", "n_urls", "n_new", "n_stale", "n_fresh",
        "n_undeclared", "recrawl_url", "recrawl_overdue_ms")
      .as[(String, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    val a = plan("a.test")
    assert((a._2, a._3, a._4, a._5, a._6) == ((4L, 1L, 1L, 1L, 1L)))
    assert(a._7 == "https://a.test/new" && a._8 == 900L,
      "the most-overdue url (the never-fetched one) must win")
    val b = plan("b.test")
    assert(b._7 == "https://b.test/t2" && b._8 == 100L,
      "equal overdue must break ties to the max url deterministically")
    val c = plan("c.test")
    assert(c._7 == "" && c._8 == 0L, "nothing due -> empty pick")
  }
}
