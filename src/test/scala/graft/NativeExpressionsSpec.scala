package graft

import graft.functions.{ArrayOps, TextHash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case behavior of the native codegen expressions: null propagation,
 *  empty inputs, and agreement between codegen and interpreted eval. */
class NativeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val schema = StructType(Seq(
    StructField("a", ArrayType(LongType), nullable = true),
    StructField("b", ArrayType(LongType), nullable = true)))

  test("sortedIntersectSize: disjoint, subset, empty, null") {
    val rows = Seq(
      Row(Seq(1L, 2L, 3L), Seq(4L, 5L)),          // disjoint → 0
      Row(Seq(1L, 2L, 3L), Seq(2L, 3L)),          // subset → 2
      Row(Seq.empty[Long], Seq(1L)),              // empty → 0
      Row(null, Seq(1L)))                         // null → null
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row)), schema)
    val out = df.select(ArrayOps.sortedIntersectSize(col("a"), col("b")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(0), Some(2), Some(0), None))
  }

  test("simHash64: empty array -> 0, null -> null, deterministic") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq("x", "y"))),
      (2, Some(Seq.empty[String])),
      (3, Option.empty[Seq[String]])).toDF("id", "t")
    val out = df.select(col("id"), TextHash.simHash64("t").as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(2) == Some(0L)) // zero votes → all bits unset
    assert(out(3) == None)
    assert(out(1).get == Seq(Seq("x", "y")).toDF("t")
      .select(TextHash.simHash64("t")).head().getLong(0))
  }

  test("minHashSignature: empty set -> MaxValue sentinels; monotone under union") {
    import spark.implicits._
    val sig = Seq((1, Seq(10L, 20L)), (2, Seq.empty[Long]))
      .toDF("id", "h").select(col("id"), TextHash.minHashSignature("h", 8).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sig(2).forall(_ == Long.MaxValue))
    // signature of a superset is element-wise <= (mins only decrease)
    val sup = Seq(Seq(10L, 20L, 30L)).toDF("h")
      .select(TextHash.minHashSignature("h", 8)).head().getSeq[Long](0)
    assert(sig(1).zip(sup).forall { case (s, p) => p <= s })
  }

  test("intersectAtLeast: agrees with plain intersect above the bar, -1 below") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b, rnd.nextInt(12))
    }
    val out = rows.toDF("a", "b", "req")
      .select(
        ArrayOps.sortedIntersectSize(col("a"), col("b")).as("exact"),
        ArrayOps.sortedIntersectAtLeast(col("a"), col("b"), col("req")).as("bounded"),
        col("req"))
      .collect()
    out.foreach { r =>
      val (exact, bounded, req) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (exact >= req) assert(bounded == exact, s"exact=$exact req=$req")
      else assert(bounded == -1, s"exact=$exact req=$req got $bounded")
    }
  }

  test("topKByValue: ties id-ordered, short groups, survives shuffle merge") {
    import spark.implicits._
    val df = Seq(
      ("a", 5.0, 10L), ("a", 5.0, 3L), ("a", 9.0, 7L), ("a", 1.0, 1L),
      ("b", 2.0, 99L)) // group smaller than k
      .toDF("g", "v", "id")
      .repartition(4) // force partial buffers + serialized merge
    val out = df.groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.GraftTopK
        .topKByValue(col("v"), col("id"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // a: 9.0->7, then tie at 5.0 broken by id asc: 3 before 10
    assert(out("a") == Seq(7L, 3L, 10L))
    assert(out("b") == Seq(99L))
  }

  test("cosine: mismatched lengths -> null (never silent truncation)") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f))).toDF("a", "b")
    assert(df.select(TextHash.cosine("a", "b")).head().isNullAt(0))
  }

  test("cosine: orthogonal 0, antiparallel -1, zero vector -> NaN (documented)") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(-1.0f, -2.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val out = df.select(TextHash.cosine("a", "b")).collect().map(_.getDouble(0))
    assert(math.abs(out(0)) < 1e-15)
    assert(math.abs(out(1) + 1.0) < 1e-12)
    assert(out(2).isNaN) // 0/0 — callers filter zero-norm vectors upstream
  }
}
