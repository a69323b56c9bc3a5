package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for wall-clock-sensitive tests; exclude with
 *  `sbt "testOnly * -- -l graft.SlowTest"` when iterating. */
object SlowTest extends Tag("graft.SlowTest")

/**
 * Bench regression guard (VERDICT r4 #6): every registered query must run
 * within a generous multiple of its COMMITTED floor (median-of-3 at
 * sf0.001 — `src/test/resources/bench_floors_sf0.001.json`), so a harness
 * or plan regression fails loudly in `sbt test` instead of surfacing in a
 * driver JSON nobody re-checks. The r4 failure mode this guards against
 * inflated queries 30-90× (session-state starvation); the 8× slack plus a
 * 10 s absolute ceiling rides out test-JVM noise (shared local[4] session,
 * GC, first-touch codegen) while still catching that class of regression.
 *
 * Queries missing from the floors file get only the absolute ceiling —
 * adding a query never fails the guard; regenerate the floors per the
 * note inside the JSON when the suite changes shape.
 */
class BenchGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private lazy val floors: Map[String, Double] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/bench_floors_sf0.001.json"), "UTF-8")
    val text = try src.mkString finally src.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val qs = node.get("queries")
    import scala.jdk.CollectionConverters._
    qs.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
  }

  private def ceiling(name: String): Double =
    math.max(10.0, floors.get(name).fold(0.0)(_ * 8))

  test("every registered query runs within its regression ceiling at sf0.001",
      SlowTest) {
    // Same hygiene discipline as the bench: one query's scratch state must
    // not tax the next (that interaction WAS the r4 regression).
    try graft.queries.StorageQueries.ensureBucketedTables(spark, dir)
    catch { case _: Throwable => () }
    def measure(name: String, fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      graft.operators.Dedup.clearGramCache()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, dir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => return Left(s"$name FAILED: ${e.getMessage}") }
      Right((System.nanoTime() - t0) / 1e9)
    }
    // A single over-ceiling measurement re-measures once before counting:
    // a one-off JIT/GC pause (observed: a 200-row projection at 16 s once,
    // 0.1 s on every other run) must not fail the build, while a genuine
    // plan regression is slow BOTH times.
    val violations = SparkEntry.benchQueries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        measure(name, fn) match {
          case Left(err) => Some(err)
          case Right(sec) if sec <= ceiling(name) => None
          case Right(first) =>
            measure(name, fn) match {
              case Left(err) => Some(err)
              case Right(second) if second <= ceiling(name) => None
              case Right(second) =>
                Some(f"$name took $first%.1f s then $second%.1f s " +
                  f"(ceiling ${ceiling(name)}%.1f s, " +
                  f"floor ${floors.getOrElse(name, 0.0)}%.2f s)")
            }
        }
    }
    assert(violations.isEmpty,
      s"bench regression guard tripped:\n  ${violations.mkString("\n  ")}")
  }
}
