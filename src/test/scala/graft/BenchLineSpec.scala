package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench→driver stdout contract (VERDICT r16, What's wrong #1):
 *  the driver keeps only the LAST ~2000 bytes of stdout, so the one
 *  machine-readable line must (a) stay under the budget for ANY query
 *  count, (b) json-parse, (c) keep the slowest queries — the rows
 *  regressions are judged by — and (d) stay auditable:
 *  value == sum(queries) + omitted_sec.
 */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def mkQueries(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => (f"pipeline_synthetic_query_name_$i%03d", (n - i) * 0.037 + 0.011))

  test("driver line fits the tail budget at 297 queries and parses") {
    val qs = mkQueries(297)
    val total = qs.map(_._2).sum
    val line = Bench.driverLine(qs, total, total * 0.9, Map.empty,
      "/root/testdata/sf0.1", 3)
    assert(line.length <= 1750, s"line is ${line.length} bytes")
    assert(!line.contains("\n"))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("n_queries").asInt() == 297)
    val queries = node.get("queries")
    assert(queries.size() + node.get("omitted").asInt() == 297)
    // slowest-first retention: the kept set is exactly the top-k medians
    val keptNames = {
      val it = queries.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result().toSet
    }
    val topK = qs.sortBy(-_._2).take(queries.size()).map(_._1).toSet
    assert(keptNames == topK)
    // auditability: value == sum(queries) + omitted_sec (3dp rounding slack)
    var keptSum = 0.0
    queries.forEach(v => keptSum += v.asDouble())
    val recon = keptSum + node.get("omitted_sec").asDouble()
    assert(math.abs(recon - node.get("value").asDouble()) < 0.5,
      s"recon $recon vs value ${node.get("value").asDouble()}")
  }

  test("driver line survives a mass-failure error map without evicting timings") {
    val qs = mkQueries(297)
    val errors = qs.take(100).map { case (n, _) =>
      n -> ("SparkException: " + ("x" * 190)) }.toMap
    val line = Bench.driverLine(qs, 10.0, 9.0, errors, "/root/testdata/sf0.1", 3)
    assert(line.length <= 1750, s"line is ${line.length} bytes")
    val node = mapper.readTree(line)
    assert(node.get("errors").size() > 0)
    assert(node.get("queries").size() > 20,
      "error map must not evict the timing payload")
  }

  test("small suites keep every query inline") {
    val qs = mkQueries(20)
    val line = Bench.driverLine(qs, qs.map(_._2).sum, 1.0, Map.empty, "/x", 1)
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 20)
    assert(node.get("omitted").asInt() == 0)
  }
}
