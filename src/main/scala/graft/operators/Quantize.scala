package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Embedding quantization (SURVEY.md §2.6 similarity, scale path): shrink
 * a float32 embedding column to int8 codes + one float scale per vector —
 * the standard 4× memory cut an ANN index takes before sharding. Per-
 * vector symmetric absmax scaling:
 *
 *   scale = max_i |v_i|      q_i = floor(v_i · 127 / scale)  ∈ [-127, 127]
 *
 * `floor` (not round) is used deliberately: its result is exact in both
 * engines for any double, so the DuckDB oracle matches bit-for-bit
 * (HALF_UP vs HALF_EVEN rounding would diverge on ties). Dequantization
 * error is bounded by scale/127 per element (QuantizeSpec pins it).
 *
 * 100 TB shape: a pure scan-projection — per-row, no shuffle, no state;
 * runs fused next to the parquet read. The per-element loops are native
 * codegen expressions ([[org.apache.spark.sql.graft.AbsMaxDouble]] /
 * [[org.apache.spark.sql.graft.QuantizeInt8Codes]]) — the interpreted-HOF
 * formulation regressed 3.9× under the round-6 runtime, and quantization
 * is the ingest step every ANN index takes, so it must stay scan-bound.
 * All-zero vectors (scale = 0) quantize to zero codes rather than
 * dividing by zero. Null vectors pass through null.
 *
 * No reference counterpart (the reference has no vector layer); companion
 * to [[Similarity]]/[[Kmeans]].
 */
object Quantize {

  /** (id, scale, q): symmetric int8 codes as BIGINTs (oracle-comparable;
   *  a production sink would cast to tinyint on write). */
  def int8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = col(vecCol)
    val s = org.apache.spark.sql.graft.GraftQuantize.absMax(v)
    df.select(col(idCol), s.as("scale"),
      org.apache.spark.sql.graft.GraftQuantize.int8Codes(v, s).as("q"))
  }

  /** Reconstruction: q_i · scale / 127 as double — for error measurement
   *  and approximate scoring over the quantized index. */
  def dequantize(df: DataFrame, qCol: String, scaleCol: String,
      as: String): DataFrame =
    df.withColumn(as,
      transform(col(qCol), q => q.cast("double") * col(scaleCol) / lit(127.0)))

  /** (id, sig): sign-bit binary quantization — bit i of `sig` set iff
   *  v_i > 0, dims ≤ 64 in ONE BIGINT (32× smaller than float32; the
   *  coarsest index tier, probed by Hamming distance =
   *  `bit_count(a ^ b)`, pure built-in codegen per pair). Dims > 64 or
   *  null vectors yield null sig — unpackable is unprobeable. See
   *  [[org.apache.spark.sql.graft.SignBits]]; search face:
   *  [[Similarity.binaryHammingTopK]]. */
  def signPack(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.GraftQuantize.signBits(col(vecCol)).as("sig"))
}
