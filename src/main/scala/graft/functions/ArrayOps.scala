package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftExpressions

/**
 * Public API for graft's custom Catalyst expressions (the expressions
 * themselves live under `org.apache.spark.sql.graft` for access to the
 * `private[sql]` Column↔Expression bridge).
 */
object ArrayOps {
  /** |A ∩ B| of two sorted long-array columns: allocation-free merge-scan,
   *  whole-stage-codegen'd (see o.a.s.sql.graft.SortedLongIntersectSize).
   *  Inputs MUST be sorted ascending (`TextHash.hashedSet` guarantees it). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftExpressions.sortedIntersectSize(a, b)

  /** |A ∩ B| when ≥ required, else −1 with an early-exit mid-scan (see
   *  o.a.s.sql.graft.SortedLongIntersectAtLeast). */
  def sortedIntersectAtLeast(a: Column, b: Column, required: Column): Column =
    GraftExpressions.sortedIntersectAtLeast(a, b, required)
}
