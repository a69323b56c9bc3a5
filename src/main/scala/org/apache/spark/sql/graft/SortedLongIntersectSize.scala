package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Custom Catalyst expression for the set-similarity verify hot path.
 *
 * `array_intersect` builds a hash set *per evaluated row* — fine for
 * occasional use, ruinous inside a candidate-pair join that evaluates
 * millions of pairs (the verify stage of every set-similarity dedup).
 * This computes |A ∩ B| of two SORTED long arrays by merge-scan: zero
 * allocation, unboxed `getLong` access, whole-stage codegen via
 * `doGenCode`, so a pair costs a few hundred primitive comparisons.
 *
 * Lives under `org.apache.spark.sql` for access to the `private[sql]`
 * expression/Column bridge (the supported pattern for third-party native
 * expressions); the public API is `graft.functions.ArrayOps`.
 *
 * Semantics stay engine-checkable: the DuckDB oracle computes the same
 * cardinality with `list_intersect` on the un-hashed sets.
 */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_long_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Early-exit variant for thresholded verification: returns |A ∩ B| when it
 * is ≥ `required`, or −1 the moment the bound c + min(remaining) shows the
 * requirement is unreachable — a below-threshold pair aborts part-way
 * through its merge-scan instead of paying for the full intersection.
 * (A returned value ≥ 0 is always the EXACT intersection size.)
 */
case class SortedLongIntersectAtLeast(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_long_intersect_at_least"

  override def nullSafeEval(l: Any, r: Any, req: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val required = req.asInstanceOf[Int]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < required) return -1
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (c < required) -1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, req) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val rem = ctx.freshName("rem")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final int $rem = ($na - $i < $nb - $j) ? ($na - $i) : ($nb - $j);
         |  if ($c + $rem < $req) { $c = -1; break; }
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = ($c >= 0 && $c < $req) ? -1 : $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * The whole thresholded-Jaccard verify as ONE expression:
 * required = ceil(t·(|A|+|B|)/(1+t) − 1e-9); run the early-exit merge-scan;
 * emit |A∩B|/(|A|+|B|−|A∩B|) when the bound is met, else NULL.
 *
 * Exists because the equivalent Column composition (`when(inter >= 0,
 * inter/(na+nb-inter))` over `sortedIntersectAtLeast`) duplicates the
 * intersect subtree 3× once the optimizer pushes the verify filter into
 * the join CONDITION (no subexpression elimination there), and the
 * inlined triple loop bloats the joined stage past codegen comfort. One
 * expression ⇒ one loop per candidate pair, small generated method.
 * Arithmetic shape (mult before divide, the 1e-9 slack, ceil-to-long)
 * matches the Column formulation bit-for-bit, so oracles are unchanged.
 */
case class JaccardThresholded(
    first: Expression, second: Expression, third: Expression,
    fourth: Expression, threshold: Double)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType, IntegerType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_thresholded"

  override def nullSafeEval(l: Any, r: Any, nl: Any, nr: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val sum = nl.asInstanceOf[Int] + nr.asInstanceOf[Int]
    val alpha = threshold * sum / (1.0 + threshold)
    val required = math.ceil(alpha - 1e-9).toLong.toInt
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < required) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (c < required) null else c * 1.0 / (sum - c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, nl, nr) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val sum = ctx.freshName("sum")
      val req = ctx.freshName("req")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val rem = ctx.freshName("rem")
      s"""
         |final int $sum = $nl + $nr;
         |final int $req = (int) Math.ceil(${threshold}D * $sum / ${1.0 + threshold}D - 1.0E-9D);
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  final int $rem = ($na - $i < $nb - $j) ? ($na - $i) : ($nb - $j);
         |  if ($c + $rem < $req) { $c = -1; break; }
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |if ($c < $req) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $c * 1.0D / ($sum - $c);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Column-level bridge (ExpressionUtils is private[sql]). */
object GraftExpressions {
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedIntersectAtLeast(a: Column, b: Column, required: Column): Column =
    ExpressionUtils.column(SortedLongIntersectAtLeast(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(required)))

  def jaccardThresholded(a: Column, b: Column, na: Column, nb: Column,
      threshold: Double): Column =
    ExpressionUtils.column(JaccardThresholded(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(na), ExpressionUtils.expression(nb), threshold))
}
