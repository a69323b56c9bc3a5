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

  test("NativeRewrites: the HOF absmax spelling optimizes to abs_max_double " +
      "and agrees on values; double arrays are left alone") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    // RDD-backed (a literal LocalRelation constant-folds before the
    // rewrite is observable).
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def floats(vs: Seq[Seq[Option[Float]]]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vs.map(v => Row(v.map(_.getOrElse(null).asInstanceOf[Any])))),
      StructType(Seq(StructField("v",
        ArrayType(FloatType, containsNull = true)))))
    val hof = floats(Seq(Seq(Some(1.5f), Some(-3.25f), Some(2.0f)),
        Seq(Some(-0.5f))))
      .selectExpr("array_max(transform(v, x -> abs(CAST(x AS double)))) AS m")
    assert(hof.queryExecution.optimizedPlan.toString.contains("abs_max_double"),
      "float-array absmax HOF must rewrite to the native expression")
    assert(hof.as[Double].collect().toSet == Set(3.25, 0.5))
    // NaN-greatest and all-null edges survive the rewrite
    val edge = floats(Seq(Seq(Some(1.0f), None, Some(Float.NaN)), Seq(None)))
      .selectExpr("array_max(transform(v, x -> abs(CAST(x AS double)))) AS m")
    val vals = edge.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.count(_.exists(_.isNaN)) == 1 && vals.count(_.isEmpty) == 1)
    // double input: types don't line up with AbsMaxDouble -> untouched
    val dbl = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(Seq(1.0, -9.0)))),
        StructType(Seq(StructField("v", ArrayType(DoubleType)))))
      .selectExpr("array_max(transform(v, x -> abs(CAST(x AS double)))) AS m")
    assert(!dbl.queryExecution.optimizedPlan.toString.contains("abs_max_double"))
    assert(dbl.as[Double].head() == 9.0)
  }
}
