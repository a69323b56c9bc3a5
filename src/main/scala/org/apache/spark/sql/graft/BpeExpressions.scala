package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-row loops for the BPE trainer (graft.operators.Bpe). Both are
 * per-ROW expressions over a word's (short) symbol array, so
 * `CodegenFallback` costs one virtual call per row — the interpreted-HOF
 * alternative walks a lambda tree per SYMBOL, which is the pattern the
 * hard-won rules ban from hot paths.
 */

/** Adjacent symbol pairs of a string array, each as "left right" —
 *  ["l","o","w"] → ["l o", "o w"]. Empty/singleton arrays → empty. */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_pairs"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      out(i - 1) = UTF8String.concatWs(space, prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent token pairs of a string array as (w1, w2) STRUCTS — the
 *  native form of the bigram HOF every LM/PMI/bucket-profile operator
 *  shared (`transform(sequence(1, size(ws)-1), i -> struct(ws[i-1],
 *  ws[i]))`, an interpreted lambda per TOKEN). Output is bit-identical
 *  on the guarded inputs all call sites use (they pre-filter
 *  `size(ws) >= 2`; for n < 2 this returns empty where the raw HOF's
 *  descending `sequence(1, n-1)` would index out of bounds). A null
 *  element yields a struct with the corresponding null FIELD, exactly
 *  like the HOF's `struct(ws[i-1], ws[i])` (ADVICE r16 — unreachable
 *  from the split()-fed call sites, pinned for reuse safety).
 *
 *  Full `doGenCode` (VERDICT r16 #6): the loop compiles into the
 *  whole-stage body instead of paying CodegenFallback's per-row boxed
 *  eval dispatch; constants as literals, no generated line begins with
 *  an operator (CodegenGuardSpec pins both rules). */
case class AdjacentPairStructs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)
  override def prettyName: String = "adjacent_pair_structs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i - 1) = org.apache.spark.sql.catalyst.InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val row = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |final int $n = $a.numElements();
         |final Object[] $out = new Object[($n < 2) ? 0 : ($n - 1)];
         |if ($n >= 2) {
         |  $utf8 $prev = $a.isNullAt(0) ? null : $a.getUTF8String(0);
         |  for (int $i = 1; $i < $n; $i++) {
         |    final $utf8 $cur = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |    $out[$i - 1] = new $row(new Object[] { $prev, $cur });
         |    $prev = $cur;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One BPE merge applied left-to-right: every adjacent ("left right")
 *  occurrence in the symbol array fuses to "leftright", non-overlapping,
 *  a single pass — ["l","o","w"] merge (l,o) → ["lo","w"]. The `pair`
 *  input is the "left right" string the trainer's argmax produced. */
case class ApplyBpeMerge(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "apply_bpe_merge"

  override def nullSafeEval(symbolsIn: Any, pairIn: Any): Any = {
    val arr = symbolsIn.asInstanceOf[ArrayData]
    val pair = pairIn.asInstanceOf[UTF8String]
    val sep = pair.indexOf(UTF8String.fromString(" "), 0)
    if (sep < 0) return arr
    val a = pair.substring(0, sep)
    val b = pair.substring(sep + 1, pair.numChars())
    val ab = UTF8String.concat(a, b)
    val n = arr.numElements()
    val out = new Array[Any](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out(w) = ab
        i += 2
      } else {
        out(w) = cur
        i += 1
      }
      w += 1
    }
    new GenericArrayData(out.take(w))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Full BPE encoding of a word array under a trained merge list: each word
 * starts as characters, then the present pair with the LOWEST merge rank
 * fuses (all its occurrences, left-to-right) until no trained pair
 * remains — the standard rank-greedy BPE tokenizer. Output is the
 * flattened subword array across all words. `merges` is the trainer's
 * ordered "left right" list (index = rank), bound at construction like
 * NearestCentroid's centroid matrix — broadcast-by-closure, never a
 * per-row column.
 */
case class BpeEncodeWords(child: Expression, merges: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_words"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i)
    }
    m
  }

  private def encodeWord(word: String,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // CODE-POINT symbols, not UTF-16 chars: the trainer's initial alphabet
    // comes from Spark's split(word, ""), whose zero-width regex never
    // matches inside a surrogate pair — encoding from lone surrogates
    // would use a different alphabet than training on any non-BMP text.
    var syms: Array[String] = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val Array(a, b) = merges(bestRank).split(" ", 2)
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            merged += (a + b); j += 2
          } else { merged += syms(j); j += 1 }
        }
        syms = merged.toArray
        if (syms.length < 2) done = true
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 4)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numChars() > 0) encodeWord(w.toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftBpe {
  def adjacentPairs(symbols: Column): Column =
    ExpressionUtils.column(AdjacentPairs(ExpressionUtils.expression(symbols)))

  /** (w1, w2) bigram structs — callers must pre-filter size >= 2. */
  def adjacentPairStructs(tokens: Column): Column =
    ExpressionUtils.column(
      AdjacentPairStructs(ExpressionUtils.expression(tokens)))

  def applyMerge(symbols: Column, pair: Column): Column =
    ExpressionUtils.column(ApplyBpeMerge(
      ExpressionUtils.expression(symbols), ExpressionUtils.expression(pair)))

  def encodeWords(words: Column, merges: Seq[String]): Column =
    ExpressionUtils.column(BpeEncodeWords(ExpressionUtils.expression(words), merges))
}
