package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-pattern SUBSTRING screening (SURVEY.md §2.6 corpus cleaning) —
 * the C4 bad-words rule at its published semantics: Raffel et al. 2020
 * §2.2 drops any page "containing any word on the blocklist", and the
 * list itself is full of multi-word PHRASES, so the honest check is
 * substring containment, not the whole-token `array_intersect` of
 * `TextAnalysis.blocklistScreen` (which is the conservative
 * Scunthorpe-safe variant — both screens are kept, they answer
 * different curation questions).
 *
 * The naive spelling is a chain of `contains(text, p1) OR contains(text,
 * p2) OR …` — |patterns| full passes over every document. These
 * expressions instead run ONE pass per document regardless of pattern
 * count, via a byte-level Aho–Corasick automaton (Aho & Corasick 1975)
 * with goto∘fail collapsed into a dense next-state table: one array
 * lookup per input byte, no fail-chain walking at match time.
 *
 * Byte-level matching over UTF-8 is exactly substring containment for
 * valid UTF-8 patterns/text (UTF-8 is self-synchronizing: a valid
 * encoded pattern cannot begin at a continuation byte), and is the same
 * definition Spark's `UTF8String.contains` and DuckDB's `contains` use
 * — so the oracle's per-pattern `contains()` replay agrees bit-exactly.
 *
 * CodegenFallback is one virtual call per ROW — noise against the
 * |text|-byte loop inside (same trade as [[RollingTokenHash]] /
 * [[SrpBucket]]). The automaton is built lazily once per
 * executor-instance from the literal pattern list and costs
 * ~1 KiB × (total pattern bytes) for the dense table — right up to
 * blocklists of a few thousand entries. Beyond that (100k+ URL/domain
 * lists) switch to the broadcast token-join shapes (`Bm25.searchTopK`).
 *
 * 100 TB shape: a pure scan projection — zero exchanges, zero joins,
 * nothing broadcast; the pattern set rides the serialized expression.
 */
final class AcAutomaton(patterns: Array[Array[Byte]])
    extends Serializable {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.length > 0), "empty pattern matches everything")

  val nPatterns: Int = patterns.length

  /** (next, outIds, anyOut): next(state)(byte) is goto with fail links
   *  fully resolved, so match time is one array lookup per byte with no
   *  fail-chain walking; outIds(state) = merged sorted pattern ids
   *  ending at state (through the fail chain); anyOut(state) caches
   *  outIds(state).nonEmpty for the boolean fast path. */
  private val (next: Array[Array[Int]], outIds: Array[Array[Int]],
      anyOut: Array[Boolean]) = {
    // trie
    val children = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for (pi <- patterns.indices) {
      var s = 0
      for (b <- patterns(pi)) {
        val c = b & 0xff
        if (children(s)(c) < 0) {
          children(s)(c) = children.length
          children += Array.fill(256)(-1)
          ends += Nil
        }
        s = children(s)(c)
      }
      ends(s) = pi :: ends(s)
    }
    // BFS: resolve fail links into next; merge outputs through fail.
    // BFS order guarantees fail(u) (strictly shallower) is fully
    // resolved before u is processed.
    val n = children.length
    val fail = Array.fill(n)(0)
    val nxt = Array.ofDim[Int](n, 256)
    val out = Array.fill(n)(List.empty[Int])
    out(0) = ends(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val v = children(0)(c)
      if (v < 0) nxt(0)(c) = 0
      else { nxt(0)(c) = v; fail(v) = 0; queue += v }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = ends(u) ::: out(fail(u))
      for (c <- 0 until 256) {
        val v = children(u)(c)
        if (v < 0) nxt(u)(c) = nxt(fail(u))(c)
        else { fail(v) = nxt(fail(u))(c); nxt(u)(c) = v; queue += v }
      }
    }
    val ids = out.map(_.toArray.sorted)
    (nxt, ids, ids.map(_.nonEmpty))
  }

  /** Sorted distinct ids of every pattern occurring in `text`. */
  def hits(text: UTF8String): Array[Int] = {
    val seen = new Array[Boolean](nPatterns)
    var found = 0
    var state = 0
    val n = text.numBytes()
    var i = 0
    while (i < n && found < nPatterns) {
      state = next(state)(text.getByte(i) & 0xff)
      if (anyOut(state)) {
        val ids = outIds(state)
        var j = 0
        while (j < ids.length) {
          if (!seen(ids(j))) { seen(ids(j)) = true; found += 1 }
          j += 1
        }
      }
      i += 1
    }
    val res = new Array[Int](found)
    var k = 0
    var p = 0
    while (p < nPatterns) {
      if (seen(p)) { res(k) = p; k += 1 }
      p += 1
    }
    res
  }

  /** True as soon as ANY pattern occurs — early exit at first match. */
  def containsAny(text: UTF8String): Boolean = {
    var state = 0
    val n = text.numBytes()
    var i = 0
    while (i < n) {
      state = next(state)(text.getByte(i) & 0xff)
      if (anyOut(state)) return true
      i += 1
    }
    false
  }
}

/**
 * Sorted distinct indexes (into `patterns`) of every pattern occurring
 * as a substring of the input string — one Aho–Corasick pass per row.
 * Value-identical to `filter(sequence(...), i -> contains(text,
 * patterns[i]))`; see [[AcAutomaton]] for the contract.
 */
case class SubstringHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "substring_hits"

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes(StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any = {
    val ids = ac.hits(input.asInstanceOf[UTF8String])
    new GenericArrayData(ids.map(i => i: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * True iff ANY of `patterns` occurs as a substring of the input — the
 * boolean fast path of [[SubstringHits]]: same automaton, early exit at
 * the first match, no array allocation. The filter-predicate form for
 * `builtin:substring_screen`-style drops.
 */
case class ContainsAnyPattern(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_any_pattern"

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes(StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any =
    ac.containsAny(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftScreen {
  def substringHits(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      SubstringHits(ExpressionUtils.expression(text), patterns))

  def containsAnyPattern(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      ContainsAnyPattern(ExpressionUtils.expression(text), patterns))
}
