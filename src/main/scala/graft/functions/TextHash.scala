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

  /** MinHash signature: k independent min-hashes over a PRE-HASHED
   *  long-array column (see `hashedSet`) — a native codegen expression
   *  (o.a.s.sql.graft.MinHashSig); the equivalent HOF formulation is
   *  interpreted per lambda element and ~50× slower. Empty input ⇒
   *  Long.MaxValue entries; filter empties upstream. */
  def minHashSignature(hashedCol: String, k: Int = 128): Column =
    org.apache.spark.sql.graft.GraftHashExpressions.minHashSig(col(hashedCol), k)

  /** LSH band hashes over a k-length signature column `sigCol`: `bands`
   *  bands of `rows` values, each hashed to one bucket. Two docs sharing
   *  any (band, bucket) become a candidate pair — the band-bucket shuffle
   *  join replaces the quadratic all-pairs comparison. */
  def bandHashes(sigCol: String, bands: Int, rows: Int): Column = {
    val rowRefs = (0 until rows).map(r => s"$sigCol[$rows * b + $r]").mkString(", ")
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> named_struct('band', b, 'bucket', xxhash64($rowRefs)))")
  }

  /** 64-bit SimHash of a string-array column: per token, each bit of
   *  xxhash64(token) votes ±1; bit set iff votes positive. Native codegen
   *  expression (o.a.s.sql.graft.SimHash64) — the HOF formulation of the
   *  same sketch is interpreted per (token × bit) and was measured at
   *  132 s / 5 000 docs vs <2 s for this. */
  def simHash64(tokensCol: String): Column =
    org.apache.spark.sql.graft.GraftHashExpressions.simhash64(col(tokensCol))

  /** Exact Jaccard similarity of two (distinct-element) array columns, as
   *  an exact small-integer ratio in double — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column =
    (size(array_intersect(a, b)) * lit(1.0)) / size(array_union(a, b))

  /** Distinct, SORTED 64-bit hashes of an array column's elements.
   *  Downstream set ops run on sorted longs — merge-scan intersection via
   *  `ArrayOps.sortedIntersectSize`, no string hashing/equality/allocation
   *  per pair. Collision risk n²/2⁶⁵ per doc is negligible (<10⁻¹² for
   *  10⁴-element docs). */
  def hashedSet(arr: Column): Column =
    array_sort(array_distinct(transform(arr, e => xxhash64(e))))

  /** Exact Jaccard of two `hashedSet` columns with precomputed sizes:
   *  merge-scan |A∩B| (custom codegen expression — zero per-pair
   *  allocation), union size by arithmetic. The per-pair hot path of every
   *  verify stage. */
  def jaccardSorted(a: Column, b: Column, na: Column, nb: Column): Column = {
    val inter = ArrayOps.sortedIntersectSize(a, b)
    (inter * lit(1.0)) / (na + nb - inter)
  }

  /** Thresholded Jaccard for verify stages: the merge-scan aborts the
   *  moment a pair provably cannot reach `threshold` (J ≥ t ⟺ |A∩B| ≥
   *  t(|A|+|B|)/(1+t)), yielding NULL; otherwise the EXACT Jaccard, equal
   *  to `jaccardSorted`. The required-overlap bound carries a 1e-9 FP
   *  slack so a boundary pair is never pruned — callers keep their final
   *  exact `>= threshold` filter. */
  def jaccardSortedThresholded(
      a: Column, b: Column, na: Column, nb: Column, threshold: Double): Column =
    // ONE fused expression (merge-scan + threshold + ratio): the Column
    // composition it replaces duplicated the intersect subtree 3× when
    // the optimizer pushed the verify filter into a join condition —
    // see JaccardThresholded scaladoc. Arithmetic shape identical.
    org.apache.spark.sql.graft.GraftExpressions
      .jaccardThresholded(a, b, na, nb, threshold)

  /** Cosine similarity of two float-array embedding columns (by name):
   *  double-widened, left-to-right accumulation — deterministic and
   *  bit-identical to the interpreted HOF formulation it replaces, but a
   *  single fused codegen loop (o.a.s.sql.graft.CosineSim). */
  def cosine(aCol: String, bCol: String): Column =
    org.apache.spark.sql.graft.GraftCosine.cosineSim(col(aCol), col(bCol))
}
