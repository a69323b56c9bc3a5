package graft

import graft.operators.IntervalJoin
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the chunked interval-overlap self-join: half-open
 *  overlap, exactly-once emission via the canonical-chunk rule, and —
 *  the load-bearing property — chunk-size INVARIANCE: the chunking is a
 *  physical plan knob, never a semantic one. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, Long)], chunk: Long) =
    IntervalJoin.overlapPairs(
        rows.toDF("id", "s", "e"), "id", "s", "e", chunk)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("half-open semantics: touching intervals do not overlap; a pair " +
      "spanning many chunks is emitted exactly once, with the true " +
      "overlap window") {
    val iv = Seq(
      (1L, 0L, 50L),   // overlaps 2 and 3
      (2L, 40L, 120L), // overlaps 1 and 3
      (3L, 45L, 46L),  // inside both
      (4L, 120L, 130L) // touches 2 at 120: NO overlap (half-open)
    )
    // chunk = 10: pair (1,2) co-occurs in chunk 4 only by the canonical
    // rule even though both also touch others; (1,3) starts in chunk 4
    val got = pairs(iv, 10L)
    assert(got == Set(
      (1L, 2L, 40L, 50L, 10L),
      (1L, 3L, 45L, 46L, 1L),
      (2L, 3L, 45L, 46L, 1L)))
    // duplicates would show as multiset inflation: recount as a list
    val lst = IntervalJoin.overlapPairs(
        iv.toDF("id", "s", "e"), "id", "s", "e", 10L)
      .collect().length
    assert(lst == 3, "each pair must be emitted exactly once")
  }

  test("chunk-size invariance: identical pair sets across chunk sizes, " +
      "matching a brute-force reference on seeded random intervals") {
    val rnd = new scala.util.Random(11)
    val iv = (1L to 120L).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i, s, s + 1 + rnd.nextInt(80).toLong)
    }
    val want = (for {
      a <- iv; b <- iv
      if a._1 < b._1 && a._2 < b._3 && b._2 < a._3
    } yield (a._1, b._1, math.max(a._2, b._2), math.min(a._3, b._3),
      math.min(a._3, b._3) - math.max(a._2, b._2))).toSet
    for (chunk <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      assert(pairs(iv, chunk) == want, s"drifted at chunkUs=$chunk")
    }
  }
}
