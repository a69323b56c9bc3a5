package graft

import graft.operators.Robots
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots.txt: grammar, group selection, longest-match
 *  decisions, wildcards/anchors, and the Spark projection face. */
class RobotsSpec extends AnyFunSuite {

  private val file = Robots.parse(
    """# site robots
      |User-agent: alpha-bot
      |User-agent: beta-bot
      |Disallow: /private/
      |Allow: /private/ok$
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /tmp/*.log$
      |Disallow: /cgi
      |Allow: /cgi-pub
      |Unknown-field: ignored
      |
      |Sitemap: https://x.test/a.xml
      |Sitemap: https://x.test/b.xml
      |nonsense line without colon
      |""".stripMargin)

  test("grammar: stacked user-agents, comments, unknown fields, " +
      "sitemaps global, crawl-delay per group") {
    assert(file.groups.length == 2)
    assert(file.groups.head.agents == Seq("alpha-bot", "beta-bot"))
    assert(file.groups.head.crawlDelay.contains(2.5))
    assert(file.sitemaps.length == 2)
    assert(Robots.crawlDelay(file, "Alpha-Bot/3.1").toString == "2.5")
    assert(Robots.crawlDelay(file, "stranger").isNaN)
  }

  test("group selection: named group beats *, case-insensitive, " +
      "longest agent token wins") {
    assert(Robots.groupFor(file, "BETA-bot 9").agents.contains("beta-bot"))
    assert(Robots.groupFor(file, "randomcrawler").agents == Seq("*"))
    val f2 = Robots.parse(
      "User-agent: bot\nDisallow: /a\n\nUser-agent: bot-special\nDisallow: /b\n")
    assert(Robots.groupFor(f2, "bot-special/2").rules.head._2 == "/b")
  }

  test("decisions: longest pattern wins, Allow wins ties, $ anchors, " +
      "* spans, no match allows") {
    // named group: /private/ blocked except the exact /private/ok
    assert(Robots.decide(file, "alpha-bot", "/private/x") == ((false, "/private/")))
    assert(Robots.decide(file, "alpha-bot", "/private/ok") == ((true, "/private/ok$")))
    assert(Robots.decide(file, "alpha-bot", "/private/ok2") == ((false, "/private/")))
    assert(Robots.decide(file, "alpha-bot", "/public") == ((true, "")))
    // * group: wildcard with end anchor
    assert(Robots.decide(file, "zzz", "/tmp/a.log") == ((false, "/tmp/*.log$")))
    assert(Robots.decide(file, "zzz", "/tmp/a.log.bak") == ((true, "")))
    // longest-match: /cgi-pub (allow) beats /cgi (disallow)
    assert(Robots.decide(file, "zzz", "/cgi-pub/x") == ((true, "/cgi-pub")))
    assert(Robots.decide(file, "zzz", "/cgi-bin/x") == ((false, "/cgi")))
    // tie-break: Allow wins at equal length
    val tie = Robots.parse("User-agent: *\nDisallow: /abc\nAllow: /ab*\n")
    assert(Robots.decide(tie, "x", "/abc")._1 === true)
    // empty Disallow contributes no rule (allow all)
    val open = Robots.parse("User-agent: *\nDisallow:\n")
    assert(Robots.decide(open, "x", "/anything") == ((true, "")))
  }

  test("decisions(): Spark projection appends allowed/rule/delay/sitemaps") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val robots = "User-agent: *\nDisallow: /no\nCrawl-delay: 3\nSitemap: s.xml\n"
    val df = Seq(
      (1L, robots, "anybot", "/no/x"),
      (2L, robots, "anybot", "/yes")).toDF("id", "robots", "agent", "path")
    val got = Robots.decisions(df, "robots", "agent", "path")
      .select("id", "allowed", "matched_rule", "crawl_delay_ms", "n_sitemaps")
      .as[(Long, Boolean, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, false, "/no", 3000L, 1L),
      (2L, true, "", 3000L, 1L)))
  }

  test("decisions(): per-partition memo parses each robots text once, " +
      "not once per URL row") {
    val spark = SparkTestSession.get
    import spark.implicits._
    // many-URLs-per-host fixture: 3 distinct robots texts over 3000 rows
    val rows = (0 until 3000).map { i =>
      val h = i % 3
      (i.toLong, s"User-agent: *\nDisallow: /no$h\nCrawl-delay: $h\n",
        "anybot", if (i % 2 == 0) s"/no$h/x" else "/ok")
    }
    val df = rows.toDF("id", "robots", "agent", "path").repartition(4)
    val before = Robots.parseCount.get()
    val got = Robots.decisions(df, "robots", "agent", "path")
      .where(!$"allowed").count()
    assert(got == 1500L)
    val parses = Robots.parseCount.get() - before
    // ≤ distinct-texts × partitions (plus slack for any concurrent spec
    // touching parse); without the memo this is ≥ 3000.
    assert(parses <= 100L, s"robots parse memo ineffective: $parses parses")
  }
}
