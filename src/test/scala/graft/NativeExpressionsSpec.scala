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

  test("randomProjectSigns: equals the in-memory mixer reference; " +
      "null vector -> null, null elements contribute zero") {
    import org.apache.spark.sql.graft.GraftRandomProject
    val dOut = 5; val scale = 1000L
    def ref(xs: Seq[Option[Float]]): Seq[Long] = {
      val acc = new Array[Long](dOut)
      xs.zipWithIndex.foreach {
        case (Some(x), i) =>
          val q = math.floor(x.toDouble * scale).toLong
          for (j <- 0 until dOut) {
            val m = (((i + 1).toLong * dOut + j) % 999983L) *
              2654435761L % 4294967296L
            acc(j) += (if (m < 2147483648L) q else -q)
          }
        case (None, _) =>
      }
      acc.toSeq
    }
    val vecs = Seq(
      Seq(Some(0.5f), Some(-1.25f), Some(0.0f)),
      Seq(Some(2.0f), None, Some(-0.001f)),
      Seq.empty[Option[Float]])
    val sch = StructType(Seq(StructField("v",
      ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = vecs.map(v =>
      Row(v.map(_.getOrElse(null).asInstanceOf[Any]))) :+ Row(null)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), sch)
    val out = df.select(
        GraftRandomProject.project(col("v"), dOut, scale).as("y"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(out(0) == ref(vecs(0)))
    assert(out(1) == ref(vecs(1)))       // null element skipped
    assert(out(2) == Seq.fill(dOut)(0L)) // empty vector -> zero components
    assert(out(3) == null)               // null vector -> null
    // signs are genuinely mixed: a one-hot input must produce both signs
    val oneHot = Seq(Some(1.0f))
    assert(ref(oneHot).toSet == Set(1000L, -1000L))
  }

  test("adjacentPairStructs == the interpreted transform-HOF on guarded inputs") {
    import org.apache.spark.sql.graft.GraftBpe
    val docs = Seq(
      "a b", "a b c d e", "x x x", "one two", "a",
      "éléphant gris éléphant", "t1 t2 t3 t4 t5 t6 t7")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(Row(_))),
      StructType(Seq(StructField("text", StringType))))
      .select(split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 2) // the guard every call site applies
    val hof = df.select(explode(expr(
      "transform(sequence(1, size(ws) - 1), " +
        "i -> struct(ws[i-1] as w1, ws[i] as w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2")).collect().map(r => (r.getString(0), r.getString(1)))
    val nat = df.select(explode(GraftBpe.adjacentPairStructs(col("ws"))).as("bg"))
      .select(col("bg.w1"), col("bg.w2")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(hof.toSeq == nat.toSeq)
  }

  test("scaledRoundSum == the interpreted aggregate-HOF fold, bit for bit") {
    import org.apache.spark.sql.graft.ScaledRoundSum
    // Adversarial values around the HALF_UP boundaries (exact n.5
    // floats, values one ulp either side, negatives — where a naive
    // rint/floor trick diverges from Spark's BigDecimal HALF_UP), plus
    // the honest decoder shapes (byte/255f, sample/32768f) and a dense
    // pseudo-random sweep.
    val rnd = new scala.util.Random(42)
    val adversarial = (0 to 512).flatMap { n =>
      val h = (n.toFloat + 0.5f) / 255f
      Seq(h, Math.nextUp(h), Math.nextDown(h), -h, -Math.nextUp(h))
    }
    val decoderish = (0 to 255).map(b => b / 255f) ++
      (-64 to 64).map(s => s * 97 / 32768f)
    val sweep = Seq.fill(4096)(rnd.nextFloat() * 300f - 20f)
    val arrays: Seq[Seq[Float]] =
      (adversarial ++ decoderish ++ sweep).grouped(64).toSeq ++
        Seq(Seq.empty[Float])
    val sch = StructType(Seq(StructField("pixels",
      ArrayType(FloatType, containsNull = false), nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(arrays.map(Row(_)) :+ Row(null)), sch)
    for (scale <- Seq(255, 32768)) {
      val got = df.select(
        expr(s"aggregate(pixels, 0L, (acc, x) -> acc + " +
          s"CAST(round(x * $scale) AS BIGINT))").as("hof"),
        ScaledRoundSum.scaledRoundSum(col("pixels"), scale.toDouble)
          .as("native")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch at scale $scale")
        if (!r.isNullAt(0))
          assert(r.getLong(0) == r.getLong(1), s"value mismatch at scale $scale")
      }
    }
    val gotF = df.select(
      expr("aggregate(pixels, 0L, (acc, x) -> acc + " +
        "CAST(floor(x * 65535D + 0.5D) AS BIGINT))").as("hof"),
      ScaledRoundSum.scaledFloorHalfSum(col("pixels"), 65535.0)
        .as("native")).collect()
    gotF.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }
}
