package graft

import graft.operators.Quantize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("int8 codes stay in [-127, 127] and dequantize within scale/127") {
    val q = Quantize.int8(emb, "embedding", "vec_id")
    val joined = q.join(emb, "vec_id")
    val deq = Quantize.dequantize(joined, "q", "scale", "approx")
    val rows = deq.select(
        zip_with(col("embedding"), col("approx"),
          (x, a) => abs(x.cast("double") - a)).as("errs"),
        col("scale"), col("q"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val errs = r.getSeq[Double](0)
      val scale = r.getDouble(1)
      val codes = r.getSeq[Long](2)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"code outside int8 symmetric range: ${codes.min}..${codes.max}")
      // floor-quantization error is one step = scale/127 (plus epsilon)
      assert(errs.forall(_ <= scale / 127.0 * (1 + 1e-9)),
        s"dequantization error ${errs.max} above ${scale / 127.0}")
    }
  }

  test("native expressions are bit-identical to the HOF formulation they replaced") {
    // The oracle-parity claim of the round-7 codegen rewrite: AbsMaxDouble
    // ≡ array_max∘transform∘abs and QuantizeInt8Codes ≡ the when/transform
    // /floor chain — over adversarial vectors: nulls, null ELEMENTS, empty
    // arrays, all-zero, subnormals, ±0.0, NaN, and random floats.
    val gen = new scala.util.Random(20260813)
    def vec(): Option[Seq[Option[Float]]] = gen.nextInt(20) match {
      case 0 => None
      case 1 => Some(Seq.empty)
      case 2 => Some(Seq(Some(0.0f), Some(-0.0f)))
      case 3 => Some(Seq(Some(Float.NaN), Some(1.0f), Some(-2.0f)))
      case 4 => Some(Seq(Some(Float.MinPositiveValue), Some(0.0f)))
      case 5 => Some(Seq(None, Some(1.5f), None))
      case 6 => Some(Seq(None))
      case _ => Some(Seq.fill(1 + gen.nextInt(8))(
        if (gen.nextInt(10) == 0) None
        else Some((gen.nextFloat() - 0.5f) * math.pow(10, gen.nextInt(8) - 4).toFloat)))
    }
    val rows = (1L to 400L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val v = col("embedding")
    val hofScale = array_max(transform(v, x => abs(x.cast("double"))))
    val hof = df.select(col("vec_id"), hofScale.as("scale"),
      when(v.isNull, lit(null))
        .when(hofScale > 0.0,
          transform(v, x => floor(x.cast("double") * lit(127.0) / hofScale).cast("long")))
        .otherwise(transform(v, _ => lit(0L))).as("q"))
    val native = Quantize.int8(df, "embedding", "vec_id")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map { r =>
        val scale = if (r.isNullAt(1)) null
          else java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        r.getLong(0) -> (scale, if (r.isNullAt(2)) null else r.getSeq[Any](2))
      }.toMap
    assert(snap(native) == snap(hof))
  }

  test("absmax element hits ±127 exactly; zero and null vectors are safe") {
    val df = Seq(
      (1L, Some(Seq(0.5f, -1.0f, 0.25f))),  // absmax = 1.0 at index 1
      (2L, Some(Seq(0.0f, 0.0f))),          // all-zero: scale 0, codes 0
      (3L, None)                            // null vector passes through
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8(df, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getSeq[Long](2)))).toMap
    assert(out(1L).get(1) == -127L, "the absmax element must map to -127")
    assert(out(2L).get == Seq(0L, 0L))
    assert(out(3L).isEmpty)
  }
}
