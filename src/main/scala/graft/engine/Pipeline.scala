package graft.engine

import graft.model.{PipelineConfig, StageConfig}
import graft.ops.{Args, BuiltinOps, LensOp}
import org.apache.spark.sql.DataFrame

/**
 * An ordered chain of lens ops — the analogue of the reference's `Append`
 * fold (reference: host-go/engine/engine.go:25-49), except the result is
 * ONE Catalyst logical plan: adjacent projections/filters fuse, predicates
 * push down to the scan, and whole-stage codegen pipelines execution the
 * way the reference's raw-bytes fast path does per item
 * (reference: host-go/engine/pipes/fromPipe.go:36-140).
 */
final case class Pipeline(stages: Seq[LensOp]) {

  /** Zero stages ⇒ identity, like `Append` with no instances
   *  (reference: host-go/engine/engine.go:26-28). */
  def forward(df: DataFrame): DataFrame = stages.foldLeft(df)((d, s) => s.forward(d))

  /**
   * The inverse pipeline: reverse the stage order and flip each stage
   * (reference: host-go/repository/repository.go:177-206, note
   * `Inverse: !moduleCfg.Inverse` at :185). A stage without an inverse
   * fails, like a module missing the `inverse` export
   * (reference: host-go/repository/repository.go:199-202).
   */
  def inverse: Pipeline = Pipeline(stages.reverse.map { s =>
    s.inverseOp.getOrElse(throw new UnsupportedOperationException(
      s"lens op '${s.name}' does not export an inverse"))
  })

  def inverseTransform(df: DataFrame): DataFrame = inverse.forward(df)

  /** Forward, but drop the host's hidden bookkeeping column before any
   *  stage that owns its row set (`LensOp.ownsRowSet` — distinct /
   *  collect_group / sort): otherwise the hidden column silently changes
   *  those ops' semantics (every row unique, singleton groups, sort undone
   *  by the host's re-order). Once dropped it stays dropped — the caller
   *  checks for the column's presence before re-ordering on it. */
  def forwardHiding(df: DataFrame, hidden: String): DataFrame =
    stages.foldLeft(df) { (d, s) =>
      s.forward(if (s.ownsRowSet && d.columns.contains(hidden)) d.drop(hidden) else d)
    }

  /** Late-bound source — the reference's Socket (reference:
   *  host-go/repository/repository.go:369-387): a pipeline is a reusable
   *  plan-to-plan function, applied per input. Works unchanged on
   *  streaming DataFrames for stateless stages. */
  def asTransform: DataFrame => DataFrame = forward
}

object Pipeline {

  /** Build from a parsed lens file; `inverse: true` on a stage flips that
   *  stage at construction (reference: host-go/config/config.go:84-100). */
  def fromConfig(cfg: PipelineConfig): Pipeline =
    Pipeline(cfg.lenses.map(stage))

  def fromJson(json: String): Pipeline = fromConfig(PipelineConfig.fromJson(json))

  private def stage(s: StageConfig): LensOp = {
    val op = BuiltinOps.resolve(s.path, Args(s.arguments))
    if (s.inverse) {
      op.inverseOp.getOrElse(throw new UnsupportedOperationException(
        s"lens op '${op.name}' does not export an inverse"))
    } else op
  }
}
