package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * A lens operator: one pipeline stage, the Spark-native analogue of a
 * reference WASM lens module (reference: host-go/engine/module/instance.go:9-34).
 *
 * Where the reference runs an opaque per-item guest function, a LensOp
 * declares its transform against the DataFrame API, so the whole pipeline
 * stays one Catalyst logical plan — projections fuse, filters push down to
 * the scan, and whole-stage codegen replaces the reference's raw-bytes
 * fast path between stages (reference: host-go/engine/pipes/fromPipe.go:36-140).
 *
 * Bidirectionality mirrors the reference's optional `inverse` export
 * (reference: README.md:33, host-go/engine/engine.go:106-112): `inverseOp`
 * is `None` exactly when the reference module would lack the export, and
 * requesting the inverse of such a stage fails the same way
 * (reference: host-go/repository/repository.go:199-202).
 */
trait LensOp extends Serializable {
  def name: String

  def forward(df: DataFrame): DataFrame

  /** None = not invertible (module without an `inverse` export). */
  def inverseOp: Option[LensOp] = None

  /** True when the op's semantics depend on the *exact* column set or it
   *  defines its own output order (distinct, collect_group, sort): a host
   *  threading a hidden bookkeeping column through the pipeline (the CLI's
   *  input-order ordinal) must drop it before such a stage, or dedup sees
   *  every row as unique / grouping keys gain a unique column / the stage's
   *  sort is undone by the host's re-order. */
  def ownsRowSet: Boolean = false

  /** Permissive-mode forward for ops that can capture PER-ROW runtime
   *  failures as in-band `__error` rows (reference P9 error items). The
   *  default is plain `forward` — declarative Column ops either fail at
   *  plan time (handled by `Pipeline.forwardPermissive`'s catch) or not at
   *  all; imperative ops (opaque guests) override to try/catch per item. */
  def forwardPermissive(df: DataFrame): DataFrame = forward(df)

  final def apply(df: DataFrame): DataFrame = forward(df)
}

object LensOp {
  /** Build a LensOp from plain functions. */
  def apply(
      opName: String,
      fwd: DataFrame => DataFrame,
      inv: Option[LensOp] = None): LensOp = new LensOp {
    override def name: String = opName
    override def forward(df: DataFrame): DataFrame = fwd(df)
    override def inverseOp: Option[LensOp] = inv
  }

  /** A mutually-inverse pair (forward.inverseOp == inverse and vice versa). */
  def invertible(
      opName: String,
      fwd: DataFrame => DataFrame,
      inv: DataFrame => DataFrame): LensOp = new LensOp { self =>
    override def name: String = opName
    override def forward(df: DataFrame): DataFrame = fwd(df)
    override val inverseOp: Option[LensOp] = Some(new LensOp {
      override def name: String = opName + ":inverse"
      override def forward(df: DataFrame): DataFrame = inv(df)
      override def inverseOp: Option[LensOp] = Some(self)
    })
  }

  /** A set-level op (`ownsRowSet = true`): semantics depend on the exact
   *  column set or the op defines its own output order. */
  def setLevel(opName: String, fwd: DataFrame => DataFrame): LensOp = new LensOp {
    override def name: String = opName
    override def forward(df: DataFrame): DataFrame = fwd(df)
    override def ownsRowSet: Boolean = true
  }

  /** Identity pass-through (reference: host-go/engine/engine.go:26-28 —
   *  `Append` with zero instances returns the source unchanged). */
  val identity: LensOp = invertible("identity", df => df, df => df)
}
