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

object GraftBpe {
  def adjacentPairs(symbols: Column): Column =
    ExpressionUtils.column(AdjacentPairs(ExpressionUtils.expression(symbols)))

  def applyMerge(symbols: Column, pair: Column): Column =
    ExpressionUtils.column(ApplyBpeMerge(
      ExpressionUtils.expression(symbols), ExpressionUtils.expression(pair)))
}
