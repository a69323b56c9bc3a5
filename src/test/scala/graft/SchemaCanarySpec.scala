package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.T

/** Schema-drift canary: every query in the suite assumes the post-`T`
 *  column types below. When the environment (Spark version, reader
 *  flags, or regenerated testdata) shifts a type, THIS spec fails once
 *  with the table/column named — instead of N downstream queries dying
 *  with opaque analysis errors (round 6 lost seven event-time queries to
 *  a silent `events.ts` nanos→TIMESTAMP_NTZ drift).
 */
class SchemaCanarySpec extends AnyFunSuite {
  private val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def assertTypes(table: String, expected: (String, DataType)*): Unit = {
    val schema = T(spark, sf, table).schema
    expected.foreach { case (col, dt) =>
      val actual = schema.find(_.name == col)
        .getOrElse(fail(s"$table.$col: column missing (schema drift — " +
          s"have ${schema.fieldNames.mkString(", ")})"))
        .dataType
      assert(actual == dt,
        s"$table.$col: expected $dt after T, got $actual (schema drift — " +
          "fix graft.queries.T, not the consumers)")
    }
  }

  test("events.ts is LongType nanos after T (the contract every event-time query assumes)") {
    assertTypes("events",
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("events.ts nanos are µs-floored and UTC-anchored (oracle compares epoch_us)") {
    import spark.implicits._
    val (mn, mx, bad) = T(spark, sf, "events")
      .selectExpr("min(ts)", "max(ts)", "sum(case when ts % 1000 != 0 then 1 else 0 end)")
      .as[(Long, Long, Long)].head()
    assert(bad == 0L, s"events.ts carries sub-µs bits ($bad rows) — DuckDB oracle would diverge")
    // events span 2024 in the generator; a tz-shifted cast would move these by hours.
    assert(mn > 1700000000000000000L && mx < 1900000000000000000L,
      s"events.ts range [$mn,$mx] outside expected epoch-nanos window — timezone drift in T?")
  }

  test("lineitem/orders keep their assumed types") {
    assertTypes("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType)
    assertTypes("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderstatus" -> StringType)
  }

  test("documents/embeddings keep their assumed types") {
    assertTypes("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    assertTypes("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }

  test("dimension tables keep their assumed types") {
    assertTypes("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertTypes("nation", "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    assertTypes("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertTypes("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertTypes("part", "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }
}
