package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the union+window as-of join: backward (latest earlier
 *  right) and forward (earliest later right), strict vs inclusive at
 *  exact time ties, and null on no-match. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
    .toDF("k", "t", "ev")
  private val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (1L, 30L, 300L))
    .toDF("rk", "rt", "rid")

  private def run(strict: Boolean, forward: Boolean): Map[String, Option[Long]] =
    AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rid"),
        strict = strict, forward = forward)
      .select("ev", "rid").as[(String, Option[Long])].collect().toMap

  test("backward: latest earlier right; strict excludes the exact tie") {
    assert(run(strict = true, forward = false) ==
      Map("e1" -> None, "e2" -> Some(150L), "e3" -> None))
    assert(run(strict = false, forward = false) ==
      Map("e1" -> Some(100L), "e2" -> Some(150L), "e3" -> None))
  }

  test("forward: earliest later right; strict excludes the exact tie") {
    // e1@10: strictly-later rights are 15 and 30 -> 150; inclusive adds
    // the tie at 10 -> 100. e2@20 -> 300 either way. k=2 has no rights.
    assert(run(strict = true, forward = true) ==
      Map("e1" -> Some(150L), "e2" -> Some(300L), "e3" -> None))
    assert(run(strict = false, forward = true) ==
      Map("e1" -> Some(100L), "e2" -> Some(300L), "e3" -> None))
  }

  test("equal-TIME right rows resolve deterministically: greatest payload " +
      "backward, least payload forward") {
    val l = Seq((1L, 20L, "e")).toDF("k", "t", "ev")
    val r = Seq((1L, 10L, 111L), (1L, 10L, 222L), // tie at t=10
                (1L, 30L, 333L), (1L, 30L, 444L)) // tie at t=30
      .toDF("rk", "rt", "rid")
    def go(forward: Boolean): Option[Long] =
      AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", Seq("rid"),
          strict = true, forward = forward)
        .select("rid").as[Option[Long]].collect().head
    assert(go(forward = false) == Some(222L),
      "backward tie must pick the struct-order greatest payload")
    assert(go(forward = true) == Some(333L),
      "forward tie must pick the struct-order least payload")
  }
}
