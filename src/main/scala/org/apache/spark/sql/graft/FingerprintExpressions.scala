package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native expressions behind `TextAnalysis.fingerprint` (SURVEY.md §2.6).
 *
 * The HOF formulation (`transform` token codes + `aggregate` fold for the
 * rolling hash; `transform`+`md5`+`array_min` over word 3-shingles) is
 * evaluated INTERPRETED by Catalyst — a boxed expression-tree walk per
 * token/shingle, measured at 9.4 s single-task for 5 000 docs at sf0.1.
 * These replace the per-element walks with one primitive loop per row and
 * are value-identical to the HOF formulation (same token-code formula,
 * same fold order, same md5-hex lexicographic min), so the DuckDB oracle
 * stays green. CodegenFallback is one virtual call per ROW — noise against
 * the |tokens|-sized loop inside (same trade as SrpBucket).
 */

/**
 * Rabin–Karp rolling hash over per-token codes of a string-array column.
 *
 * Token code = ascii(first char)·31 + length (chars) — identical to
 * `(ascii(t)*31 + length(t))::long`. Fold matches DuckDB `list_reduce` /
 * Catalyst `aggregate(slice(codes,2,n-1), codes[0], (acc,x) ->
 * pmod(acc*31+x, 1e9+7))`: the FIRST code is the initial accumulator
 * (un-modded when it is the only element), each later code folds as
 * (acc·31 + x) mod 1e9+7.
 */
case class RollingTokenHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_token_hash"

  private def tokenCode(u: UTF8String): Long = {
    // First-CODEPOINT semantics (0 for empty) — matches DuckDB's `ascii`,
    // which is what the oracle computes, for ANY input. NB: Spark's own
    // `ascii` builtin returns the first byte and diverges on non-ASCII
    // leading characters; the replaced HOF formulation therefore agreed
    // with this expression (and the oracle) only on ASCII corpora. The
    // codepoint definition is the portable one, so it is authoritative.
    val first = if (u.numBytes == 0) 0 else u.toString.codePointAt(0)
    first.toLong * TextFingerprint.RollBase + u.numChars()
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var acc = tokenCode(arr.getUTF8String(0))
    var i = 1
    while (i < n) {
      acc = (acc * TextFingerprint.RollBase + tokenCode(arr.getUTF8String(i))) %
        TextFingerprint.RollMod
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Lexicographic minimum of md5-hex over word 3-shingles of a string-array
 * column; null when the array has fewer than 3 tokens. Identical to
 * `array_min(transform(shingles, md5))` where shingle i =
 * `concat_ws(" ", ws[i], ws[i+1], ws[i+2])`: lowercase same-length hex
 * strings order exactly like the digest bytes compared unsigned, so the
 * min is tracked on raw digests and hex-encoded once at the end.
 */
case class MinShingleMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"

  private val space = Array[Byte](' ')

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    while (i <= n - 3) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      md.update(space)
      md.update(arr.getUTF8String(i + 1).getBytes)
      md.update(space)
      md.update(arr.getUTF8String(i + 2).getBytes)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new StringBuilder(32)
    best.foreach(b => hex.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(hex.toString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFingerprint {
  val RollBase = 31L
  val RollMod = 1000000007L

  def rollingTokenHash(ws: Column): Column =
    ExpressionUtils.column(RollingTokenHash(ExpressionUtils.expression(ws)))

  def minShingleMd5(ws: Column): Column =
    ExpressionUtils.column(MinShingleMd5(ExpressionUtils.expression(ws)))
}
