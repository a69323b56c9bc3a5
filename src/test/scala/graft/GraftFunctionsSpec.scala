package graft

import org.apache.spark.sql.graft.{GraftFunctions, GraftSparkExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions are reachable from plain SQL after registration
 *  (live-session path here; GraftSparkExtensions covers session-build). */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("SQL functions: cosine_sim, sorted_long_intersect_size, simhash64, minhash_sig") {
    GraftFunctions.register(spark)

    val cos = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), " +
        "CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val inter = spark.sql(
      "SELECT sorted_long_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .head().getInt(0)
    assert(inter == 2)

    // simhash64 matches the Column API value
    val viaSql = spark.sql(
      "SELECT simhash64(array('a', 'b', 'c')) AS s").head().getLong(0)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaCol = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.TextHash.simHash64("t")).head().getLong(0)
    assert(viaSql == viaCol)

    val sig = spark.sql(
      "SELECT minhash_sig(array(42L, 7L), 4) AS s").head().getSeq[Long](0)
    assert(sig.length == 4)
    // non-literal k rejected
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array(1L), CAST(rand()*4 AS INT))").collect())
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("extensions class injects all functions at session build") {
    // Unit-level: the extension applies its injections to a fresh
    // SparkSessionExtensions without error and covers every function name.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    assert(GraftFunctions.all.map(_._1).toSet ==
      Set("simhash64", "minhash_sig", "sorted_long_intersect_size", "cosine_sim"))
  }
}
