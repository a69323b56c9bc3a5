package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/**
 * Exact top-k ids by value per group, as a typed imperative aggregate —
 * the aggregation-machinery counterpart of the `row_number()`-window
 * top-k (`q_topk_per_group`).
 *
 * Scale shape: the window formulation shuffles and sorts EVERY row of
 * every group; this aggregate's partial (map-side) buffers never exceed k
 * entries, so the shuffle carries ≤ k·16 bytes per (partition × group)
 * and no sort of the full data ever happens — the right top-k at 100 TB.
 *
 * Ordering: value descending, id ascending on ties — fully deterministic,
 * DuckDB-checkable (`(list(id ORDER BY v DESC, id))[1:k]`).
 */
case class TopKByValue(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
    with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(value, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_value"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** (a, idA) ranks before (b, idB): higher value first, lower id on tie.
   *  Double.compare gives a TOTAL order (NaN greatest, -0.0 < 0.0) — a
   *  raw `>`/`==` comparator is non-transitive under NaN and TimSort may
   *  throw "Comparison method violates its general contract". NaN inputs
   *  are additionally filtered in update(), so NaN ordering never shows
   *  in output; the total order is defense in depth for merge(). */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(before)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    // NaN (reachable: cosine of a zero vector is 0/0) never ranks — it has
    // no meaningful order against real scores.
    if (v != null && i != null && !java.lang.Double.isNaN(v.asInstanceOf[Double])) {
      buf += ((v.asInstanceOf[Double], i.asInstanceOf[Long]))
      // amortize: trim when the buffer doubles past k
      if (buf.length >= 2 * k) trim(buf)
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortWith(before).take(k).map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val t = trim(buf)
    val bb = ByteBuffer.allocate(4 + t.length * 16)
    bb.putInt(t.length)
    t.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), id = newChildren(1))
}

object GraftTopK {
  /** Aggregate Column: top-k `id`s by `value` (desc, id-asc ties). */
  def topKByValue(value: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByValue(
      ExpressionUtils.expression(value),
      ExpressionUtils.expression(id), k).toAggregateExpression())
}
