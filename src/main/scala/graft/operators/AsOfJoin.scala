package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * As-of join: match each left row to the latest right row with
 * `right.time < left.time` (strict) or `<=` (inclusive) for the same key.
 * The reference has no joins at all (SURVEY.md §2.5); this is the classic
 * time-series operator Spark's DataFrame API lacks, composed from
 * built-ins so Catalyst still owns the plan.
 *
 * Scale design: the naive formulation — equi-join on key, filter
 * `rt < lt`, then argmax per left row — materializes |L|×|R| rows per key
 * before reducing, which explodes on hot keys. Instead:
 *
 *   1. tag both sides and UNION them (cheap, no shuffle);
 *   2. one shuffle: repartition by key, sort by (time, tag) within
 *      partitions (the window below does this);
 *   3. running `last(right_payload, ignoreNulls)` over
 *      (unboundedPreceding → currentRow) gives every left row its
 *      most-recent right match in a single pass;
 *   4. keep left rows.
 *
 * Cost: one shuffle of |L|+|R| rows, zero blowup — survives skewed keys
 * and a 100× scale-up where the join+argmax version dies.
 */
object AsOfJoin {

  private val TAG = "__graft_asof_tag"
  private val PAYLOAD = "__graft_asof_payload"

  /**
   * @param rightCols right columns to expose on matches (null when no
   *                  earlier right row exists) — must not clash with left
   *                  column names.
   * @param strict    true ⇒ right rows at exactly the left row's time do
   *                  NOT match (tie broken by tag ordering in the sort).
   * @param forward   false (default) ⇒ classic backward as-of: the
   *                  LATEST right row before the left row. true ⇒ the
   *                  EARLIEST right row after it (next-event
   *                  attribution: "first purchase after this view").
   *                  Same single-shuffle plan — only the scan direction
   *                  of the running-last window flips.
   */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      strict: Boolean = true,
      forward: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"rightCols ${rightCols.intersect(leftCols).mkString(",")} clash with left columns")

    // At equal times the sort order of the tags decides strictness:
    // strict  ⇒ left sorts first (earlier rows only can match),
    // inclusive ⇒ right sorts first (equal-time right rows match).
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)

    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn(TAG, lit(leftTag))
      .withColumn(PAYLOAD, lit(null).cast(payloadType))

    val r = right.select(
      col(rightKey).as(leftKey),
      col(rightTime).as(leftTime),
      lit(rightTag).as(TAG),
      struct(rightCols.map(col): _*).as(PAYLOAD))

    // Align column order for the union.
    val unioned = l.select((leftCols :+ TAG :+ PAYLOAD).map(col): _*)
      .unionByName(
        r.select(
          (leftCols.map(c => if (c == leftKey || c == leftTime) col(c)
                             else lit(null).cast(left.schema(c).dataType).as(c))
            :+ col(TAG) :+ col(PAYLOAD)): _*))

    // forward = the same scan run in reverse time order: "preceding"
    // rows are then the LATER rights, and the running last() is the
    // nearest one. Tag tie semantics are unchanged (strict keeps the
    // left before equal-time rights in scan order either way).
    // PAYLOAD is the final sort key so ties among EQUAL-TIME right rows
    // are deterministic (the r9 q_token_pps lesson: hash-green +
    // nondeterministic is a driver-red waiting to happen): the scan's
    // running last() picks the struct-order GREATEST payload backward
    // and LEAST forward (payload desc under the reversed scan) — the
    // deterministic analogue of "latest/next right row".
    val timeOrd = if (forward) col(leftTime).desc else col(leftTime).asc
    val payloadOrd = if (forward) col(PAYLOAD).desc else col(PAYLOAD).asc
    val w = Window.partitionBy(col(leftKey))
      .orderBy(timeOrd, col(TAG), payloadOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(PAYLOAD, last(col(PAYLOAD), ignoreNulls = true).over(w))
      .where(col(TAG) === leftTag)

    val out = leftCols.map(col) ++ rightCols.map(c => col(s"$PAYLOAD.$c").as(c))
    matched.select(out: _*)
  }
}
