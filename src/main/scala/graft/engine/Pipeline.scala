package graft.engine

import graft.model.{PipelineConfig, StageConfig}
import graft.ops.{Args, BuiltinOps, LensOp, OpaqueOp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
   *  collect_group / sort / opaque): otherwise the hidden column silently
   *  changes those ops' semantics (every row unique, singleton groups,
   *  sort undone by the host's re-order). Once dropped it stays dropped —
   *  the caller checks for the column's presence before re-ordering on it. */
  def forwardHiding(df: DataFrame, hidden: String): DataFrame =
    stages.foldLeft(df) { (d, s) =>
      s.forward(if (s.ownsRowSet && d.columns.contains(hidden)) d.drop(hidden) else d)
    }

  /**
   * P9 completion — per-op error-as-data: like `forwardHiding`, but a
   * stage that FAILS (e.g. `rename` on a missing column) turns its input
   * rows into `__error` rows — data columns null, `__error` carrying the
   * op name + message — which keep flowing through the remaining stages
   * exactly like the reference's in-band negative-type-id error items
   * (reference: host-go/engine/module/protocol.go:43,57-59). An already-
   * errored row keeps its ORIGINAL `__error` (first cause wins). The
   * fail-fast path is `forwardHiding`, matching the reference surfacing
   * the error on `Value()`.
   */
  def forwardPermissive(df: DataFrame, hidden: String): DataFrame =
    stages.foldLeft(df) { (d, s) =>
      val input = if (s.ownsRowSet && d.columns.contains(hidden)) d.drop(hidden) else d
      // forwardPermissive lets imperative ops (opaque guests) also capture
      // PER-ROW runtime failures; the catch below handles plan-time ones.
      try s.forwardPermissive(input)
      catch {
        case e: Exception =>
          val msg = s"lens op '${s.name}' failed: ${e.getMessage}"
          val dataCols = input.columns.filterNot(c => c == "__error" || c == hidden)
          val keep = input.columns.filter(_ == hidden).map(col).toSeq
          val err =
            if (input.columns.contains("__error")) coalesce(col("__error"), lit(msg))
            else lit(msg)
          input.select(dataCols.map(c =>
            lit(null).cast(input.schema(c).dataType).as(c)).toSeq ++
            keep :+ err.as("__error"): _*)
      }
    }

  /** Late-bound source — the reference's Socket (reference:
   *  host-go/repository/repository.go:369-387): a pipeline is a reusable
   *  plan-to-plan function, applied per input. Works unchanged on
   *  streaming DataFrames for stateless stages. */
  def asTransform: DataFrame => DataFrame = forward
}

object Pipeline {

  /** Resolves `sha256:` content-id stage references — the analogue of the
   *  reference fetching a module by URL at config time
   *  (reference: host-go/engine/engine.go:59-104). The default resolver
   *  knows no ids; `LensEngine` supplies its registry. */
  trait Resolver { def byId(id: String): Option[Pipeline] }
  object NoResolver extends Resolver { def byId(id: String): Option[Pipeline] = None }

  /** Build from a parsed lens file; `inverse: true` on a stage flips that
   *  stage at construction (reference: host-go/config/config.go:84-100). */
  def fromConfig(cfg: PipelineConfig): Pipeline = fromConfig(cfg, NoResolver)

  def fromConfig(cfg: PipelineConfig, resolver: Resolver): Pipeline =
    build(cfg, resolver, Set.empty, None)

  /** As [[fromConfig]], additionally recording every module-byte fetch the
   *  compile performs into `fetchedSink` (keyed by stage path). Lets the
   *  caller derive content ids from the EXACT bytes this pipeline
   *  executes, without a second fetch — for a mutable `http:` ref the two
   *  fetches could even disagree (see LensEngine.publishAll). */
  def fromConfig(cfg: PipelineConfig, resolver: Resolver,
      fetchedSink: scala.collection.mutable.Map[String, Array[Byte]]): Pipeline =
    build(cfg, resolver, Set.empty, Some(fetchedSink))

  def fromJson(json: String): Pipeline = fromConfig(PipelineConfig.fromJson(json))

  def fromJson(json: String, resolver: Resolver): Pipeline =
    fromConfig(PipelineConfig.fromJson(json), resolver)

  private def build(
      cfg: PipelineConfig, resolver: Resolver, visiting: Set[String],
      fetchedSink: Option[scala.collection.mutable.Map[String, Array[Byte]]]): Pipeline =
    Pipeline(fuse(cfg.lenses).map { case (s, times) =>
      stage(s, times, resolver, visiting, fetchedSink)
    })

  /** Collapse a run of consecutive `builtin:opaque` — or `.wasm`-module —
   *  stages that name the same `instance` (and are otherwise identical)
   *  into one stage applied k times over ONE shared guest instance — the
   *  reference's shared-instance state semantics (reference:
   *  host-go/engine/tests/wasm32_pipeline_with_state_test.go:16-100). */
  private def fuse(stages: Seq[StageConfig]): Seq[(StageConfig, Int)] =
    stages.foldLeft(Vector.empty[(StageConfig, Int)]) { (acc, s) =>
      acc.lastOption match {
        case Some((p, k)) if p == s && p.arguments.contains("instance") &&
            (p.path == "builtin:opaque" || ModuleFetch.supports(p.path)) =>
          acc.init :+ ((p, k + 1))
        case _ => acc :+ ((s, 1))
      }
    }

  private def stage(
      s: StageConfig, times: Int, resolver: Resolver,
      visiting: Set[String],
      fetchedSink: Option[scala.collection.mutable.Map[String, Array[Byte]]]): LensOp = {
    val args = Args(s.arguments)
    val op: LensOp =
      if (s.path == "builtin:opaque") {
        // Arguments beyond the host keys are the MODULE's parameters,
        // handed to the guest's set_param export (P6) — the reference
        // passes the stage's arguments JSON to the module the same way
        // (reference: tests/integration/cli/with_params_test.go).
        val params = s.arguments.filterNot { case (k, _) =>
          k == "guest" || k == "instance" || k == "serial" }
        val paramsJson =
          if (params.isEmpty) None
          else Some(params.map { case (k, v) =>
            s"${graft.model.Json.quote(k)}:$v" }.mkString("{", ",", "}"))
        OpaqueOp(args.str("guest"), times, serial = args.bool("serial"),
          params = paramsJson)
      } else if (ModuleFetch.supports(s.path)) {
        // A stage may reference either a real WebAssembly MODULE or a
        // whole stored lens FILE by URL — the reference's scheme-dispatched
        // fetch (reference: host-go/engine/engine.go:67-104; `file:`,
        // `data:`, `http(s):`), which likewise sniffs the fetched bytes.
        // A `\0asm` module becomes an executed-bytecode guest stage; JSON
        // is inlined as a sub-pipeline. Cycle-checked by canonical ref.
        val key = ModuleFetch.visitKey(s.path)
        require(!visiting.contains(key),
          s"cyclic lens reference: '${s.path}'")
        val bytes = ModuleFetch.fetchBytes(s.path)
        fetchedSink.foreach(_.update(s.path, bytes))
        if (graft.wasm.WasmBinary.isWasm(bytes)) wasmStage(s, bytes, times)
        else {
          require(times == 1,
            s"'instance' fusion applies to guest modules, not lens files: '${s.path}'")
          val sub = build(
            PipelineConfig.fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)),
            resolver, visiting + key, fetchedSink)
          subPipelineOp(s.path, sub)
        }
      } else if (s.path.startsWith("sha256:")) {
        // Reference a stored pipeline by content id, resolved through the
        // registry. Content ids cannot cycle: an id commits to the full
        // config bytes, which cannot contain the id itself.
        val sub = resolver.byId(s.path).getOrElse(throw new IllegalArgumentException(
          s"unknown pipeline reference: '${s.path}' (not in the registry)"))
        subPipelineOp(s.path, sub)
      } else BuiltinOps.resolve(s.path, args)
    if (s.inverse) {
      op.inverseOp.getOrElse(throw new UnsupportedOperationException(
        s"lens op '${op.name}' does not export an inverse"))
    } else op
  }

  /** A lens stage whose `path` fetched a genuine `.wasm` binary: register
   *  the module (content-addressed) as an executed-bytecode partition
   *  guest and drive it through the SAME opaque machinery builtin guests
   *  use — fusion-free, permissive-error-capable, inverse via the
   *  module's own `inverse` export. Host argument keys: `schema` (DDL of
   *  the output document when the module changes shape; default = input
   *  schema), `serial`; everything else is the module's set_param JSON
   *  (reference: host-go/engine/engine.go:67-104 GetWasmBytes +
   *  config/config.go:84-100 export selection). */
  private def wasmStage(s: StageConfig, bytes: Array[Byte], times: Int): LensOp = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val name = "wasm:" + digest.map(b => f"$b%02x").mkString
    val schemaFn: org.apache.spark.sql.types.StructType => org.apache.spark.sql.types.StructType =
      s.arguments.get("schema") match {
        case Some(ddlJson) =>
          val ddl = graft.model.Json.parse(ddlJson).asText()
          val out = org.apache.spark.sql.types.StructType.fromDDL(ddl)
          _ => out
        case None => in => in
      }
    graft.ops.GuestRegistry.register(name, graft.ops.BytesGuest.asPartitionGuest(
      new graft.ops.WasmGuest(bytes, "transform", None, schemaFn)))
    val params = s.arguments.filterNot { case (k, _) =>
      k == "schema" || k == "serial" || k == "instance" }
    val paramsJson =
      if (params.isEmpty) None
      else Some(params.map { case (k, v) =>
        s"${graft.model.Json.quote(k)}:$v" }.mkString("{", ",", "}"))
    OpaqueOp(name, times = times, serial = Args(s.arguments).bool("serial"),
      params = paramsJson)
  }

  private def subPipelineOp(label: String, sub: Pipeline): LensOp = new LensOp {
    override def name: String = label
    override def forward(df: DataFrame): DataFrame = sub.forward(df)
    /** The sub-pipeline's stages may hide a host bookkeeping column. */
    override def ownsRowSet: Boolean = sub.stages.exists(_.ownsRowSet)
    override def inverseOp: Option[LensOp] =
      try Some(subPipelineOp(s"$label:inverse", sub.inverse))
      catch { case _: UnsupportedOperationException => None }
  }
}
