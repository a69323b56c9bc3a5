package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Hash/shingle expression builders for the dedup + text-analysis operators
 * (SURVEY.md §2.6 north-star additions — not in the reference, which has no
 * scalar function surface at all; its transforms are opaque WASM).
 *
 * Everything here emits Catalyst higher-order-function expressions
 * (`transform`/`aggregate`/`zip_with` over arrays) — fully codegen'd, no
 * Scala UDFs, so the hot path stays inside whole-stage codegen and columnar
 * batches. Builders take *column names* (they splice into SQL expression
 * strings), so callers materialize inputs with `withColumn` first.
 */
object TextHash {

  /** Distinct word w-grams ("shingles") as space-joined strings, from a
   *  string-array column `wordsCol`. Callers must filter
   *  `size(wordsCol) >= w` rows first — a sequence() with a negative stop
   *  would count DOWN in Spark SQL. */
  def wordShingles(wordsCol: String, w: Int = 3): Column = {
    val parts = (0 until w)
      .map(o => if (o == 0) s"$wordsCol[i]" else s"$wordsCol[i + $o]")
      .mkString(", ' ', ")
    array_distinct(expr(
      s"transform(sequence(0, size($wordsCol) - $w), i -> concat($parts))"))
  }

  /** Distinct character n-grams of string column `textCol` (1-based
   *  substring, same semantics as DuckDB). Filter `length >= n` first. */
  def charNgrams(textCol: String, n: Int = 3): Column =
    array_distinct(expr(
      s"transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))"))

  /** MinHash signature: k independent min-hashes over the string-array
   *  column `shinglesCol`. One xxhash64 per (shingle, seed) — k·|shingles|
   *  codegen'd hashes, no shuffle. Empty input ⇒ null entries; filter
   *  empties upstream. */
  def minHashSignature(shinglesCol: String, k: Int = 128): Column =
    expr(s"transform(sequence(0, ${k - 1}), " +
      s"k -> array_min(transform($shinglesCol, s -> xxhash64(s, k))))")

  /** LSH band hashes over a k-length signature column `sigCol`: `bands`
   *  bands of `rows` values, each hashed to one bucket. Two docs sharing
   *  any (band, bucket) become a candidate pair — the band-bucket shuffle
   *  join replaces the quadratic all-pairs comparison. */
  def bandHashes(sigCol: String, bands: Int, rows: Int): Column = {
    val rowRefs = (0 until rows).map(r => s"$sigCol[$rows * b + $r]").mkString(", ")
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> named_struct('band', b, 'bucket', xxhash64($rowRefs)))")
  }

  /** SimHash bit votes over a string-array column `tokensCol`: per token,
   *  xxhash64 → each of 64 bits votes +1/−1; returns the 64 vote sums. */
  def simHashVotes(tokensCol: String): Column = expr(
    s"""aggregate(
       |  $tokensCol,
       |  array_repeat(0L, 64),
       |  (acc, t) -> zip_with(acc,
       |    transform(sequence(0, 63),
       |      b -> CASE WHEN ((xxhash64(t) >> b) & 1) = 1 THEN 1L ELSE -1L END),
       |    (x, y) -> x + y))""".stripMargin)

  /** Collapse 64 vote sums (column `votesCol`) into the SimHash: bit b set
   *  iff votes[b] > 0. */
  def votesToSimHash(votesCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63),
       |    b -> CASE WHEN $votesCol[b] > 0 THEN shiftleft(1L, b) ELSE 0L END),
       |  0L, (a, v) -> a | v)""".stripMargin)

  /** Exact Jaccard similarity of two (distinct-element) array columns, as
   *  an exact small-integer ratio in double — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column =
    (size(array_intersect(a, b)) * lit(1.0)) / size(array_union(a, b))

  /** Cosine similarity of two float-array embedding columns (by name),
   *  accumulated in double, left-to-right (deterministic order). */
  def cosine(aCol: String, bCol: String): Column = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    expr(s"${dot(aCol, bCol)} / (sqrt(${dot(aCol, aCol)}) * sqrt(${dot(bCol, bCol)}))")
  }
}
