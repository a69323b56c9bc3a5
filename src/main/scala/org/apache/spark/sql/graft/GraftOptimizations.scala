package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Optimizer rule normalizing interpreted higher-order-function patterns
 * to this package's native codegen expressions — the CLAUDE.md
 * "HOFs are interpreted" rule enforced by the OPTIMIZER instead of by
 * code review: a user (or a lens `select_expr` stage) who writes the
 * idiomatic SQL spelling still executes the fused native kernel.
 *
 * Every rewrite here must be exactly value- and type-preserving,
 * including null/NaN edges — the pairs are documented and spec-tested
 * as ≡ (see [[AbsMaxDouble]]'s contract):
 *
 *  - `array_max(transform(v, x -> abs(CAST(x AS double))))` over
 *    `array<float>` → [[AbsMaxDouble]](v). Same null-skipping max,
 *    null on empty/all-null, NaN-greatest ordering; the HOF spelling
 *    allocates an intermediate array and interprets two lambdas per
 *    row, the native form is one fused loop inside whole-stage codegen
 *    (the absmax scale pass of int8 quantization — a per-vector hot
 *    path at ingest).
 *
 * Registered two ways (mirroring [[GraftFunctions]]): via
 * `injectOptimizerRule` from [[GraftSparkExtensions]] (cluster plugin
 * path), or [[GraftFunctions.registerOptimizations]] on a live session
 * (`spark.experimental.extraOptimizations`). The rule is a no-op on
 * plans without the pattern — one tree scan in the optimizer, nothing
 * at execution time.
 */
object NativeRewrites extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayMax(ArrayTransform(arr, LambdaFunction(
            Abs(Cast(body: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(arg: NamedLambdaVariable), _)))
          if isFloatArray(arr) && body.exprId == arg.exprId =>
        AbsMaxDouble(arr)
    }
}
