package graft.queries

import graft.engine.{LensEngine, Pipeline}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The reference's canonical transform semantics (SURVEY.md §2.3, T1–T8)
 * exercised through the real lens-pipeline engine (JSON lens file →
 * Pipeline → DataFrame fold) over the driver's testdata tables, each with
 * a DuckDB oracle.
 */
object LensQueries extends QueryProvider {

  // T1 — simple rename map (reference:
  // tests/modules/rust_wasm32_simple/src/lib.rs:15-65).
  private def renamePipe(s: SparkSession, dir: String): DataFrame = {
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:rename","arguments":{"src":"c_name","dst":"full_name"}},
        |  {"path":"builtin:select","arguments":{"cols":["c_custkey","full_name"]}}
        |]}""".stripMargin)
    pipe.forward(T(s, dir, "customer"))
  }

  // T2 — arithmetic map with inverse (reference:
  // tests/modules/rust_wasm32_simple2/src/lib.rs:19-57).
  private val arithJson =
    """{"lenses":[
      |  {"path":"builtin:with_column","arguments":
      |    {"col":"c_custkey","expr":"c_custkey + 1","inverse_expr":"c_custkey - 1"}}
      |]}""".stripMargin

  private def arithPipe(s: SparkSession, dir: String): DataFrame =
    Pipeline.fromJson(arithJson)
      .forward(T(s, dir, "customer"))
      .select(col("c_custkey").as("key_plus_one"), col("c_name"))

  // P11 — inverse pipeline derivation: forward then inverse must be the
  // identity (reference: host-go/repository/repository.go:177-206,
  // tests/integration/cli/with_inverse_test.go:13-40).
  private def roundtrip(s: SparkSession, dir: String): DataFrame = {
    val pipe = Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:rename","arguments":{"src":"c_name","dst":"full_name"}},
        |  {"path":"builtin:with_column","arguments":
        |    {"col":"c_custkey","expr":"c_custkey + 1","inverse_expr":"c_custkey - 1"}}
        |]}""".stripMargin)
    pipe.inverseTransform(pipe.forward(T(s, dir, "customer")))
      .select("c_custkey", "c_name")
  }

  // T5 — filter (reference: tests/modules/rust_wasm32_filter/src/lib.rs:17-32).
  private def filterPipe(s: SparkSession, dir: String): DataFrame =
    Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:filter","arguments":{"expr":"lang = 'en'"}},
        |  {"path":"builtin:select","arguments":{"cols":["doc_id","lang","source"]}}
        |]}""".stripMargin)
      .forward(T(s, dir, "documents"))

  // T6 — normalize / 1:N explode (reference:
  // tests/modules/rust_wasm32_normalize/src/lib.rs:22-78). Testdata has no
  // array column, so the pipeline first builds one (split on space), then
  // explodes — exercising with_column + explode + select in one plan.
  private def explodePipe(s: SparkSession, dir: String): DataFrame =
    Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:with_column","arguments":{"col":"words","expr":"split(text, ' ')"}},
        |  {"path":"builtin:explode","arguments":{"col":"words","as":"word"}},
        |  {"path":"builtin:select","arguments":{"cols":["doc_id","word"]}}
        |]}""".stripMargin)
      .forward(T(s, dir, "documents"))

  // T7 — stateful counter as a deterministic, scalable global sequence
  // (reference: tests/modules/rust_wasm32_counter/src/lib.rs:26-54; scale
  // design SURVEY.md §7.5.1).
  private def counterPipe(s: SparkSession, dir: String): DataFrame =
    Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:select","arguments":{"cols":["doc_id"]}},
        |  {"path":"builtin:counter","arguments":{"as":"id","order_by":"doc_id"}}
        |]}""".stripMargin)
      .forward(T(s, dir, "documents"))

  // P10 — unknown lens id ⇒ identity pass-through through the engine
  // (reference: host-go/repository/repository.go:244-254).
  private def identityPipe(s: SparkSession, dir: String): DataFrame = {
    val engine = LensEngine()
    val unknown = "sha256:" + "0" * 64
    engine.transform(T(s, dir, "nation"), unknown)
  }

  // L1–L4 — registry add/transform round-trip through a content id
  // (reference: host-go/store/store.go:131-218).
  private def registryPipe(s: SparkSession, dir: String): DataFrame = {
    val engine = LensEngine()
    val id = engine.add(
      """{"lenses":[
        |  {"path":"builtin:rename","arguments":{"src":"n_name","dst":"nation_name"}},
        |  {"path":"builtin:filter","arguments":{"expr":"n_regionkey < 3"}}
        |]}""".stripMargin)
    // Idempotent re-add must return the same content id (dedup, store.go:30-33).
    val id2 = engine.add(
      """{"lenses":[
        |  {"path":"builtin:rename","arguments":{"src":"n_name","dst":"nation_name"}},
        |  {"path":"builtin:filter","arguments":{"expr":"n_regionkey < 3"}}
        |]}""".stripMargin)
    require(id == id2, s"content id not deterministic: $id vs $id2")
    engine.transform(T(s, dir, "nation"), id)
      .select("n_nationkey", "nation_name", "n_regionkey")
  }

  // P5 — opaque guest transform as a lens-file stage: a user-registered
  // per-item function (the Spark analogue of a user WASM module — see
  // graft.ops.RowGuest). The guest is 1:1 and partition-independent, so
  // its effect is SQL-expressible and the oracle checks it exactly; the
  // SHARED-STATE fusion semantics are spec-checked (LensEngineSpec /
  // LensCliSpec golden, reference wasm32_pipeline_with_state_test.go).
  // 100 TB shape: narrow map stage, partition-local state, no shuffle.
  private def opaquePipe(s: SparkSession, dir: String): DataFrame = {
    graft.ops.GuestRegistry.register("double_acct", new graft.ops.RowGuest {
      override def outputSchema(in: org.apache.spark.sql.types.StructType) = in
      override def open(in: org.apache.spark.sql.types.StructType)
          : org.apache.spark.sql.Row => org.apache.spark.sql.Row = {
        val idx = in.fieldIndex("c_acctbal")
        r => org.apache.spark.sql.Row.fromSeq(
          r.toSeq.updated(idx, r.getDouble(idx) * 2)) // *2 is FP-exact
      }
    })
    Pipeline.fromJson(
      """{"lenses":[
        |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_acctbal"]}},
        |  {"path":"builtin:opaque","arguments":{"guest":"double_acct"}}
        |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
      .withColumnRenamed("c_acctbal", "doubled_bal")
  }

  // P5 REAL — lens stages whose `path` is a genuine `.wasm` binary,
  // executed by the embedded WebAssembly interpreter on the executors
  // (graft.wasm; reference: host-go/runtimes/wasmtime/runtime.go:164-227
  // + engine.go:67-104 GetWasmBytes). The modules are authored as
  // bytecode (LensGuestModules), shipped inside the lens file as a
  // data:;base64 URL — the full reference path: fetch → magic-sniff →
  // instantiate → set_param → pull-mode transform over framed items in
  // linear memory. Oracles replay the arithmetic/filter/fan-out in SQL,
  // certifying the executed bytecode cross-engine. 100 TB shape: narrow
  // map over each partition, module bytes broadcast in the closure, one
  // instance per partition, guest heap bounded per item; the interpreter
  // is the ABI-parity escape hatch (~µs/item), not the hot path —
  // builtin: stages stay whole-stage-codegen.
  private def wasmDataUrl(bytes: Array[Byte]): String =
    "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(bytes)

  private def wasmShiftPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(graft.wasm.LensGuestModules.shiftGuest("c_custkey"))
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_name"]}},
         |  {"path":"$url","arguments":{"delta":1000000}}
         |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
      .withColumnRenamed("c_custkey", "shifted_key")
  }

  /** The wasm-gc tier through the FULL lens path: same pull-mode shift
   *  contract as `lens_wasm_shift`, but the guest's value path runs
   *  through GC objects — the sum is boxed into a struct field, fanned
   *  into a 2-element array, and guarded by an i31 ref.eq identity and
   *  an array.len check (a miss traps, so a silently-broken GC engine
   *  cannot pass). The oracle replays the arithmetic in SQL, certifying
   *  the executed GC bytecode cross-engine. */
  private def wasmGcPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(
      graft.wasm.LensGuestModules.shiftGuest("c_custkey", viaGc = true))
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_name"]}},
         |  {"path":"$url","arguments":{"delta":2000000}}
         |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
      .withColumnRenamed("c_custkey", "shifted_key")
  }

  /** The r16 GC CAST tier end-to-end: the shift guest's value path runs
   *  through precise ref.test (concrete targets resolved over the
   *  declared sub chain), a br_on_cast dispatch, an extern-hierarchy
   *  round trip with ref.cast home, and two zero-sum corrections read
   *  from a data-segment-seeded array (array.new_data + init_data) —
   *  every op load-bearing for the oracle hash. 100 TB shape: identical
   *  to lens_wasm_gc (per-partition interpretation, no extra exchange).
   *  reference: host-go/runtimes/wasmtime/runtime.go:164-227 (any valid
   *  module instantiates; the cast tier is part of "valid"). */
  private def wasmGcCastPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(
      graft.wasm.LensGuestModules.shiftGuest("c_custkey", viaGcCast = true))
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_name"]}},
         |  {"path":"$url","arguments":{"delta":3000000}}
         |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
      .withColumnRenamed("c_custkey", "shifted_key")
  }

  /** The late-r16 EH tier end-to-end: the shift guest's sum is thrown
   *  as a tag payload, captured as an exnref by catch_all_ref,
   *  rethrown with throw_ref, and caught back by the outer tag handler
   *  — every no-throw path is Unreachable, so a dispatch slip traps
   *  instead of passing. 100 TB shape: identical to the other wasm
   *  rows (per-partition interpretation, no extra exchange). */
  private def wasmEhPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(
      graft.wasm.LensGuestModules.shiftGuest("c_custkey", viaEh = true))
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_name"]}},
         |  {"path":"$url","arguments":{"delta":4000000}}
         |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
      .withColumnRenamed("c_custkey", "shifted_key")
  }

  private def wasmFilterPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(graft.wasm.LensGuestModules.filterGuest("c_custkey"))
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["c_custkey","c_mktsegment"]}},
         |  {"path":"$url","arguments":{"min":700}}
         |]}""".stripMargin)
      .forward(T(s, dir, "customer"))
  }

  private def wasmRepeatPipe(s: SparkSession, dir: String): DataFrame = {
    val url = wasmDataUrl(graft.wasm.LensGuestModules.repeatGuest())
    Pipeline.fromJson(
      s"""{"lenses":[
         |  {"path":"builtin:select","arguments":{"cols":["n_nationkey","n_name"]}},
         |  {"path":"$url","arguments":{"times":3}}
         |]}""".stripMargin)
      .forward(T(s, dir, "nation"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lens_wasm_shift"   -> (wasmShiftPipe _),
    "lens_wasm_gc"      -> (wasmGcPipe _),
    "lens_wasm_cast"    -> (wasmGcCastPipe _),
    "lens_wasm_eh"      -> (wasmEhPipe _),
    "lens_wasm_filter"  -> (wasmFilterPipe _),
    "lens_wasm_repeat"  -> (wasmRepeatPipe _),
    "lens_opaque"       -> (opaquePipe _),
    "lens_rename"       -> (renamePipe _),
    "lens_with_column"  -> (arithPipe _),
    "lens_roundtrip"    -> (roundtrip _),
    "lens_filter"       -> (filterPipe _),
    "lens_explode"      -> (explodePipe _),
    "lens_counter"      -> (counterPipe _),
    "lens_identity"     -> (identityPipe _),
    "lens_registry"     -> (registryPipe _)
  )

  override val oracles: Map[String, String] = Map(
    "lens_wasm_shift" ->
      "SELECT c_custkey + 1000000 AS shifted_key, c_name FROM customer",
    "lens_wasm_gc" ->
      "SELECT c_custkey + 2000000 AS shifted_key, c_name FROM customer",
    "lens_wasm_cast" ->
      "SELECT c_custkey + 3000000 AS shifted_key, c_name FROM customer",
    "lens_wasm_eh" ->
      "SELECT c_custkey + 4000000 AS shifted_key, c_name FROM customer",
    "lens_wasm_filter" ->
      "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey >= 700",
    "lens_wasm_repeat" ->
      """SELECT n_nationkey, n_name FROM nation
        |CROSS JOIN (VALUES (1),(2),(3)) AS copies(i)""".stripMargin,
    "lens_opaque" ->
      "SELECT c_custkey, c_acctbal * 2 AS doubled_bal FROM customer",
    "lens_rename" ->
      "SELECT c_custkey, c_name AS full_name FROM customer",
    "lens_with_column" ->
      "SELECT c_custkey + 1 AS key_plus_one, c_name FROM customer",
    "lens_roundtrip" ->
      "SELECT c_custkey, c_name FROM customer",
    "lens_filter" ->
      "SELECT doc_id, lang, source FROM documents WHERE lang = 'en'",
    "lens_explode" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
    "lens_counter" ->
      "SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS id FROM documents",
    "lens_identity" ->
      "SELECT * FROM nation",
    "lens_registry" ->
      "SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation WHERE n_regionkey < 3"
  )
}
