package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native builders for hashed element sets (sorted distinct xxhash64
 * values) — the per-document precomputation feeding every set-similarity
 * operator. Values are bit-identical to the HOF formulation
 * `array_sort(array_distinct(transform(grams, xxhash64)))` (same
 * XXH64/seed-42 primitives), but a document costs one tight loop + one
 * sort instead of |grams| interpreted lambda evals (measured: 4.5 s → sub-
 * second for 5 000 docs at sf0.1).
 *
 * These are per-ROW (not per-pair) expressions, so `CodegenFallback` — one
 * virtual call per row around a primitive loop — loses nothing measurable;
 * the per-pair hot paths (SortedLongIntersectSize, CosineSim) carry full
 * `doGenCode`.
 */
private[graft] object SetBuilders {
  /** Sort + in-place unique; returns a possibly-shorter array. */
  def sortedUnique(a: Array[Long], n: Int): Array[Long] = {
    if (n == 0) return Array.emptyLongArray
    java.util.Arrays.sort(a, 0, n)
    var w = 1
    var i = 1
    while (i < n) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOfRange(a, 0, w)
  }
}

/**
 * Sorted distinct xxhash64 values of a string's character n-grams —
 * equivalent to hashing DuckDB's `substring(text, i, n)` grams
 * (character-indexed, so multi-byte text behaves identically).
 */
case class HashedCharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, "n must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val chars = s.numChars()
    val m = chars - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = XXH64.hashUTF8String(s.substring(i, i + n), 42L)
      i += 1
    }
    new GenericArrayData(SetBuilders.sortedUnique(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Sorted distinct xxhash64 values of word w-shingles (space-joined runs of
 * w consecutive elements of a string array) — value-identical to hashing
 * `concat(ws[i], ' ', …, ws[i+w-1])`.
 */
case class HashedWordShingles(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(w >= 1, "w must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    val m = nw - w + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val words = new Array[UTF8String](nw)
    var i = 0
    while (i < nw) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](m)
    val parts = new Array[UTF8String](w)
    i = 0
    while (i < m) {
      var j = 0
      while (j < w) { parts(j) = words(i + j); j += 1 }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(space, parts: _*), 42L)
      i += 1
    }
    new GenericArrayData(SetBuilders.sortedUnique(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * POSITIONED xxhash64 values of word w-shingles: element i is the hash of
 * the shingle starting at word i — no dedup, no sort, so `posexplode`
 * yields (position, gram-hash) pairs. Same XXH64/seed-42/concatWs
 * primitives as [[HashedWordShingles]], so a hash here equals the hash of
 * the same shingle there (and of DuckDB's literal space-joined gram, up to
 * 64-bit collisions). Feeds position-aware consumers (duplicate-span
 * detection) where the set builders' distinctness would lose offsets.
 */
case class PositionedWordShingles(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(w >= 1, "w must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positioned_word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    val m = nw - w + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val words = new Array[UTF8String](nw)
    var i = 0
    while (i < nw) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](m)
    val parts = new Array[UTF8String](w)
    i = 0
    while (i < m) {
      var j = 0
      while (j < w) { parts(j) = words(i + j); j += 1 }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(space, parts: _*), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftSetBuilders {
  def hashedCharNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(HashedCharNgrams(ExpressionUtils.expression(text), n))

  def hashedWordShingles(words: Column, w: Int): Column =
    ExpressionUtils.column(HashedWordShingles(ExpressionUtils.expression(words), w))

  def positionedWordShingles(words: Column, w: Int): Column =
    ExpressionUtils.column(PositionedWordShingles(ExpressionUtils.expression(words), w))
}
