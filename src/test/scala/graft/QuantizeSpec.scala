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
