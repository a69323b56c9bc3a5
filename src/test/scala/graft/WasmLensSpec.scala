package graft

import graft.engine.Pipeline
import graft.wasm.LensGuestModules
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.util.Base64

/** Lens files whose stage `path` references a REAL `.wasm` module —
 *  fetched by URL, magic-sniffed, and executed as bytecode on the
 *  executors (the reference's GetWasmBytes path,
 *  host-go/engine/engine.go:67-104). */
class WasmLensSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def dataUrl(module: Array[Byte]): String =
    "data:application/wasm;base64," + Base64.getEncoder.encodeToString(module)

  private val shiftUrl = dataUrl(LensGuestModules.shiftGuest("Age"))

  test("a lens stage pointing at a wasm module executes the bytecode") {
    val pipe = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
    val out = pipe.forward(Seq(("John", 32L), ("Ada", 36L)).toDF("Name", "Age"))
      .as[(String, Long)].collect().toSeq.sorted
    out shouldBe Seq(("Ada", 41L), ("John", 37L))
  }

  test("a guest built with post-MVP opcodes (trunc_sat + sign-ext) runs " +
      "through the lens path unchanged") {
    // same shift guest, but its value path routes through
    // f64.convert_i64_s -> i64.trunc_sat_f64_s (0xFC 6) -> i64.extend32_s
    // (0xC4) — the opcodes modern LLVM/Rust toolchains emit by default;
    // identity on i32-range values, so output must equal the MVP guest's.
    val satUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaSatConversions = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L)).toDF("Name", "Age")
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val sat = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$satUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    sat shouldBe mvp
    sat shouldBe Set(("John", 37L), ("Ada", 41L), ("Neg", -2L))
  }

  test("a guest built with multi-value blocks + bulk memory (passive " +
      "segment, memory.init/data.drop) runs through the lens path unchanged") {
    // same shift guest, but (v, signed-delta) rides a func-type block
    // (params carried through a br) and each instance runs one
    // memory.init + data.drop round against a passive segment — the
    // other post-MVP families LLVM enables by default. Both are
    // identities, so output must equal the MVP guest's. Multiple rows
    // per partition also prove data.drop doesn't poison later
    // transforms (a dropped segment traps on len > 0 re-init).
    val mvbUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaMultiValueBulk = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L))
      .toDF("Name", "Age").coalesce(1) // one partition => one shared instance
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val mvb = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$mvbUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    mvb shouldBe mvp
    mvb shouldBe Set(("John", 37L), ("Ada", 41L), ("Neg", -2L), ("Zed", 5L))
    // and the inverse export still derives the round-trip (P11)
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$mvbUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe Set(("John", 32L), ("Ada", 36L),
        ("Neg", -7L), ("Zed", 0L))
  }

  test("a guest whose arithmetic runs in f64 (convert + add + neg/mul/" +
      "abs/copysign gauntlet + trunc_sat) replays the MVP guest " +
      "byte-identically through the lens path") {
    val fpUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaFloatPath = true))
    // values chosen to cross zero and sign boundaries — exact in f64
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", (1L << 50)), ("Low", -(1L << 50)))
      .toDF("Name", "Age")
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val fp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$fpUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    fp shouldBe mvp
    fp should contain(("Big", (1L << 50) + 5L))
    // inverse derivation still holds through the float path (P11)
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$fpUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with simd128 (v128 local, i64x2 splat/add, " +
      "v128.store/load round-trip) replays the MVP guest byte-identically " +
      "through the lens path") {
    val simdUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaSimdPath = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", Long.MaxValue - 2L)).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val simd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$simdUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    simd shouldBe mvp
    simd should contain(("Big", Long.MinValue + 2L)) // i64 lane wrap == scalar
    // inverse derivation still holds through the simd path (P11)
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$simdUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with reference-types (runtime table.grow/init from " +
      "a passive expr elem segment, ref.func/is_null, typed select, " +
      "call_indirect dispatch) replays the MVP guest byte-identically " +
      "through the lens path") {
    val refUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaRefTypes = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", (1L << 50))).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val ref = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$refUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    ref shouldBe mvp
    ref should contain(("Big", (1L << 50) + 5L))
    // inverse derivation still holds through the ref-dispatch path (P11)
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$refUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with atomics (-pthread shape: atomic store + " +
      "rmw.add with an old-value cross-check + fence + atomic load) " +
      "replays the MVP guest byte-identically through the lens path") {
    val atUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaAtomics = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", Long.MaxValue - 2L)).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val at = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$atUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    at shouldBe mvp
    at should contain(("Big", Long.MinValue + 2L)) // i64 wrap == scalar add
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$atUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with relaxed-simd (f64x2.relaxed_madd under the " +
      "deterministic profile + trunc_sat) replays the MVP guest " +
      "byte-identically through the lens path") {
    val rsUrl = dataUrl(LensGuestModules.shiftGuest("Age",
      viaRelaxedSimd = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", (1L << 50))).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val rs = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$rsUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    rs shouldBe mvp
    rs should contain(("Big", (1L << 50) + 5L))
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$rsUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with wasm-gc (the sum boxed through a struct " +
      "field, fanned into an array, i31 ref.eq + array.len guards) " +
      "replays the MVP guest byte-identically through the lens path") {
    val gcUrl = dataUrl(LensGuestModules.shiftGuest("Age", viaGc = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", Long.MaxValue - 2L)).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val gc = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$gcUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    gc shouldBe mvp
    gc should contain(("Big", Long.MinValue + 2L)) // i64 wrap preserved
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$gcUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with the wasm-gc CAST tier (precise ref.test over " +
      "a declared sub chain, br_on_cast dispatch, extern round trip + " +
      "ref.cast, data-seeded array corrections) replays the MVP guest " +
      "byte-identically through the lens path") {
    val castUrl = dataUrl(LensGuestModules.shiftGuest("Age", viaGcCast = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", Long.MaxValue - 2L)).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val gc = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$castUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    gc shouldBe mvp
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$castUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("a guest built with the EH tier (throw -> catch_all_ref -> " +
      "throw_ref -> tag catch) replays the MVP guest byte-identically " +
      "through the lens path") {
    val ehUrl = dataUrl(LensGuestModules.shiftGuest("Age", viaEh = true))
    val in = Seq(("John", 32L), ("Ada", 36L), ("Neg", -7L), ("Zed", 0L),
      ("Big", Long.MaxValue - 2L)).toDF("Name", "Age").coalesce(1)
    val mvp = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    val eh = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$ehUrl","arguments":{"delta":5}}]}""")
      .forward(in).as[(String, Long)].collect().toSet
    eh shouldBe mvp
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$ehUrl","arguments":{"delta":5}}]}""")
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe in.as[(String, Long)].collect().toSet
  }

  test("the module's inverse export drives `\"inverse\": true` stages") {
    val fwd = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$shiftUrl","arguments":{"delta":9}}]}""")
    val roundTrip = Pipeline.fromJson(
      s"""{"lenses":[
            {"path":"$shiftUrl","arguments":{"delta":9}},
            {"path":"$shiftUrl","arguments":{"delta":9},"inverse":true}
          ]}""")
    val in = Seq(("John", 32L), ("Ada", 36L)).toDF("Name", "Age")
    fwd.forward(in).as[(String, Long)].collect().toSet shouldBe
      Set(("John", 41L), ("Ada", 45L))
    roundTrip.forward(in).as[(String, Long)].collect().toSet shouldBe
      Set(("John", 32L), ("Ada", 36L))
    // and Pipeline.inverse derives the reversed+flipped chain (P11)
    fwd.inverse.forward(fwd.forward(in)).as[(String, Long)]
      .collect().toSet shouldBe Set(("John", 32L), ("Ada", 36L))
  }

  test("a wasm filter module changes stream length (1:<=1 pull contract)") {
    val url = dataUrl(LensGuestModules.filterGuest("Age"))
    val pipe = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$url","arguments":{"min":35}}]}""")
    val in = Seq(("John", 32L), ("Ada", 36L), ("Grace", 45L), ("Al", 10L))
      .toDF("Name", "Age")
    pipe.forward(in).as[(String, Long)].collect().toSet shouldBe
      Set(("Ada", 36L), ("Grace", 45L))
  }

  test("a wasm 1:N module emits buffered repeats") {
    val url = dataUrl(LensGuestModules.repeatGuest())
    val pipe = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$url","arguments":{"times":3}}]}""")
    val in = Seq(("a", 1L), ("b", 2L)).toDF("Name", "Age")
    val out = pipe.forward(in).as[(String, Long)].collect().toSeq
    out.groupBy(identity).view.mapValues(_.size).toMap shouldBe
      Map(("a", 1L) -> 3, ("b", 2L) -> 3)
  }

  test("file: scheme fetches and executes a .wasm artifact on disk") {
    val f = java.nio.file.Files.createTempFile("lens-shift", ".wasm")
    try {
      java.nio.file.Files.write(f, LensGuestModules.shiftGuest("Age"))
      val pipe = Pipeline.fromJson(
        s"""{"lenses":[{"path":"file:$f","arguments":{"delta":1}}]}""")
      val out = pipe.forward(Seq(("x", 7L)).toDF("Name", "Age"))
        .as[(String, Long)].collect().toSeq
      out shouldBe Seq(("x", 8L))
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("a stateful wasm counter numbers a serial stream (T7 as bytecode)") {
    val url = dataUrl(LensGuestModules.counterGuest("Id"))
    val pipe = Pipeline.fromJson(
      s"""{"lenses":[{"path":"$url","arguments":{"serial":true}}]}""")
    val in = Seq(("w", 0L), ("x", 0L), ("y", 0L), ("z", 0L)).toDF("Name", "Id")
    pipe.forward(in).as[(String, Long)].collect().toSet shouldBe
      Set(("w", 1L), ("x", 2L), ("y", 3L), ("z", 4L))
  }

  test("fused same-instance wasm stages share ONE guest's state (P7: ids 3,6,9)") {
    // the reference's with_state pipeline: three consecutive stages naming
    // the same instance over the stateful counter module — each item
    // passes the SAME wasm instance three times, so its counter reads
    // 3, 6, 9 (reference: wasm32_pipeline_with_state_test.go:16-100)
    val url = dataUrl(LensGuestModules.counterGuest("Id"))
    val stage = s"""{"path":"$url","arguments":{"instance":"i1","serial":true}}"""
    val pipe = Pipeline.fromJson(s"""{"lenses":[$stage,$stage,$stage]}""")
    val in = Seq((0L, "John"), (0L, "Shahzad"), (0L, "Addo")).toDF("Id", "Name")
    val out = pipe.forward(in).as[(Long, String)].collect().toSeq
    out.toSet shouldBe Set((3L, "John"), (6L, "Shahzad"), (9L, "Addo"))
    // WITHOUT the instance key, stages do not fuse: three independent
    // counters each re-number from 1, so every item ends at its position
    val stageNoInst = s"""{"path":"$url","arguments":{"serial":true}}"""
    val indep = Pipeline.fromJson(
      s"""{"lenses":[$stageNoInst,$stageNoInst,$stageNoInst]}""")
      .forward(in).as[(Long, String)].collect().toSeq
    indep.toSet shouldBe Set((1L, "John"), (2L, "Shahzad"), (3L, "Addo"))
  }

  test("a guest error surfaces with the guest's own message") {
    // module parameterized but the lens file passes no arguments
    val pipe = Pipeline.fromJson(s"""{"lenses":[{"path":"$shiftUrl"}]}""")
    val e = intercept[Exception] {
      pipe.forward(Seq(("x", 1L)).toDF("Name", "Age")).collect()
    }
    e.getMessage should include(LensGuestModules.NoParamsMsg)
  }
}
