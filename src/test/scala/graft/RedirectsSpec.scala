package graft

import graft.operators.Redirects
import org.scalatest.funsuite.AnyFunSuite

/** Pointer-doubling redirect resolution: exact hop counts, loop and
 *  budget semantics, deterministic multi-Location collapse. */
class RedirectsSpec extends AnyFunSuite {

  private def resolveMap(edges: Seq[(String, String)], maxHops: Int)
      : Map[String, (String, Long, Boolean)] = {
    val spark = SparkTestSession.get
    import spark.implicits._
    Redirects.resolve(edges.toDF("src", "dst"), maxHops)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("chains land on the first terminal with exact hop counts; " +
      "2-cycles, self-loops and chains INTO them are unresolved") {
    val out = resolveMap(Seq(
      "a" -> "b", "b" -> "c", // a -2-> c, b -1-> c; c terminal
      "d" -> "e", "e" -> "d", // 2-cycle
      "f" -> "f", // self-loop
      "g" -> "d", // feeds the cycle
      "h" -> "a" // h -3-> c through the chain
    ), maxHops = 8)
    assert(out("a") == (("c", 2L, true)))
    assert(out("b") == (("c", 1L, true)))
    assert(out("h") == (("c", 3L, true)))
    Seq("d", "e", "f", "g").foreach { s =>
      assert(out(s) == (("", -1L, false)), s"$s must be unresolved")
    }
    // terminals (no outgoing edge) never appear as rows
    assert(!out.contains("c"))
  }

  test("the hop budget is exact even though doubling overshoots to a " +
      "power of two: length <= maxHops resolves, length > maxHops not") {
    // chain u0 <- u1 <- ... <- u6 (lengths 1..6 from each start)
    val chain = (1 to 6).map(i => s"u$i" -> s"u${i - 1}")
    val five = resolveMap(chain, maxHops = 5)
    assert(five("u5") == (("u0", 5L, true)))
    assert(five("u6") == (("", -1L, false)),
      "length 6 must miss a 5-hop budget even with 8-reach doubling")
    val six = resolveMap(chain, maxHops = 6)
    assert(six("u6") == (("u0", 6L, true)))
    // maxHops = 1: zero doubling rounds, only direct-to-terminal lands
    val one = resolveMap(chain, maxHops = 1)
    assert(one("u1") == (("u0", 1L, true)))
    assert(one("u2") == (("", -1L, false)))
  }

  test("multiple captured Locations for one src collapse to the " +
      "lexicographic min before resolution") {
    val out = resolveMap(Seq("a" -> "z", "a" -> "m", "z" -> "q"),
      maxHops = 4)
    // min("z", "m") = "m", a terminal -> a lands on m in 1 hop
    assert(out("a") == (("m", 1L, true)))
    assert(out("z") == (("q", 1L, true)))
  }

  test("maxHops outside [1, 1024] fails by name") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val df = Seq("a" -> "b").toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      Redirects.resolve(df, maxHops = 0))
    assert(e.getMessage.contains("maxHops"))
  }
}
