package graft.wasm

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Lens guest modules, authored as WebAssembly bytecode.
 *
 * Each value here is a genuine `.wasm` binary (magic `\0asm`, encoded by
 * [[WasmBinary.encode]]) implementing the reference's guest ABI
 * (reference: host-go/runtimes/wasmtime/runtime.go:164-227 and the guest
 * side sdk-rust/src/lib.rs):
 *
 *  - exports `memory`, `alloc(i32)->i32`, `transform()->i32`, and
 *    optionally `inverse()->i32` / `set_param(i32)->i32`;
 *  - imports `lens.next: () -> i32` and PULLS its input through it —
 *    zero, one, or many items per `transform` call;
 *  - items cross linear memory framed as `[i8 typeId][u32 LE len][bytes]`
 *    with typeIds Err=-1, Nil=0, JSON=1, EOS=127
 *    (reference: host-go/engine/module/protocol.go:44-53,
 *    host-go/engine/pipes/protocol.go:31-89).
 *
 * The guests operate on the JSON item bytes directly (byte scan +
 * integer parse/format — no allocation-heavy JSON tree), the same way
 * size-conscious real-world guests do:
 *
 *  - [[shiftGuest]]: adds `delta` (set_param) to the named integer
 *    field; exports `inverse` subtracting it — the reference's T2/T3
 *    arithmetic lens (reference: tests/modules/rust_wasm32/src/lib.rs)
 *    with its parameter and inverse variants.
 *  - [[filterGuest]]: pulls until an item's integer field >= `min`,
 *    forwarding the winning frame verbatim — the 1:<=1 len-change
 *    contract (reference: tests/modules/rust_wasm32_filter, and
 *    fromPipe's pull loop host-go/engine/pipes/fromPipe.go:36-140).
 *  - [[repeatGuest]]: emits each pulled item `times` times via a
 *    pending counter carried in guest globals across `transform` calls —
 *    the buffered 1:N contract (reference:
 *    tests/modules/rust_wasm32_normalize/src/lib.rs:22-78's pending
 *    queue, reduced to its state shape).
 *
 * Memory discipline: a bump allocator whose pointer RESETS at each
 * transform entry (after the previous output frame has been consumed by
 * the host), so per-partition memory is bounded by one item's frames,
 * never the partition — the property that makes the guest safe on a
 * 100 TB scan. `repeatGuest` resets only when its pending buffer drains.
 */
object LensGuestModules {

  // ---- ABI constants ----
  val TypeErr: Int = -1
  val TypeNil: Int = 0
  val TypeJson: Int = 1
  val TypeEos: Int = 127

  val NoParamsMsg = "Parameters have not been set."

  import ValType.{Empty, I32, I64}

  // concise instruction aliases
  private def ic(v: Int) = I32Const(v)
  private def lc(v: Long) = I64Const(v)
  private val addI = Num(0x6A); private val subI = Num(0x6B)
  private val mulI = Num(0x6C)
  private val addL = Num(0x7C); private val subL = Num(0x7D)
  private val mulL = Num(0x7E); private val divUL = Num(0x80)
  private val remUL = Num(0x82)
  private val eqI = Num(0x46); private val neI = Num(0x47)
  private val ltI = Num(0x48); private val gtI = Num(0x4A)
  private val geI = Num(0x4E)
  private val ltL = Num(0x53); private val geL = Num(0x59)
  private val shrUI = Num(0x76)
  private val extendS = Num(0xAC)
  private def load8s(off: Int = 0) = MemLoad(0x2C, 0, off)
  private def load8u(off: Int = 0) = MemLoad(0x2D, 0, off)
  private def load32(off: Int = 0) = MemLoad(0x28, 2, off)
  private def store8(off: Int = 0) = MemStore(0x3A, 0, off)
  private def store32(off: Int = 0) = MemStore(0x36, 2, off)

  // ---- shared function types ----
  private val tNoArgPtr = FuncType(Vector(), Vector(I32)) // next/transform/inverse
  private val tPtrPtr = FuncType(Vector(I32), Vector(I32)) // alloc/set_param
  private val tFind = FuncType(Vector(I32, I32, I32, I32), Vector(I32))
  private val tParse = FuncType(Vector(I32), Vector(I64))
  private val tWrite = FuncType(Vector(I32, I64), Vector(I32))
  private val tMkErr = FuncType(Vector(I32, I32), Vector(I32))
  private val tShift = FuncType(Vector(I64), Vector(I32))
  private val types = Vector(tNoArgPtr, tPtrPtr, tFind, tParse, tWrite, tMkErr, tShift)
  private val TNoArgPtr = 0; private val TPtrPtr = 1; private val TFind = 2
  private val TParse = 3; private val TWrite = 4; private val TMkErr = 5
  private val TShift = 6

  // ---- function indices (import first, then defined order) ----
  private val NEXT = 0
  private val ALLOC = 1
  private val FIND = 2
  private val PARSE = 3
  private val WRITE = 4
  private val MKERR = 5
  private val F6 = 6 // first guest-specific function

  // ---- globals (same layout in every guest) ----
  private val HEAP = 0 // i32 mut: bump pointer
  private val HAS_PARAM = 1 // i32 mut
  private val PARAM = 2 // i64 mut: delta / min / times
  private val PARSE_END = 3 // i32 mut: parseI64's end pointer
  private val PEND = 4 // i32 mut (repeat guest): items left to re-emit
  private val PEND_PTR = 5 // i32 mut (repeat guest)

  /** Data-segment strings packed from offset 16; returns (segment, offsets). */
  private final class DataPacker {
    private var off = 16
    private val parts = Vector.newBuilder[(Int, Array[Byte])]
    def add(s: String): (Int, Int) = {
      val b = s.getBytes(UTF_8)
      val at = off
      parts += ((at, b))
      off += b.length
      (at, b.length)
    }
    def heapBase: Int = (off + 7) & ~7
    def segments: Vector[DataSeg] =
      parts.result().map { case (at, b) => DataSeg(at, b.toVector) }
  }

  // ---------- shared helper function bodies ----------

  /** alloc(n)->ptr: bump + grow. locals: 0=n, 1=ptr, 2=need. */
  private val allocBody = FuncBody(Vector(I32, I32), Vector(
    GlobalGet(HEAP), LocalTee(1),
    LocalGet(0), addI, GlobalSet(HEAP),
    // need = heap - memoryBytes; grow ceil(need/64Ki) pages if positive
    GlobalGet(HEAP), MemorySize, ic(65536), mulI, subI, LocalTee(2),
    ic(0), gtI,
    If(Empty, Vector(
      LocalGet(2), ic(65535), addI, ic(16), shrUI, MemoryGrow, Drop), Vector()),
    LocalGet(1)))

  /** find(hay,hayLen,needle,needleLen)->idx|-1. locals: 4=i,5=j,6=limit. */
  private val findBody = FuncBody(Vector(I32, I32, I32), Vector(
    LocalGet(1), LocalGet(3), subI, LocalTee(6),
    ic(0), ltI,
    If(Empty, Vector(ic(-1), Return), Vector()),
    ic(0), LocalSet(4),
    Block(Empty, Vector(
      Loop(Empty, Vector(
        LocalGet(4), LocalGet(6), gtI, BrIf(1), // i > limit -> exit
        ic(0), LocalSet(5),
        Block(Empty, Vector(
          Loop(Empty, Vector(
            LocalGet(5), LocalGet(3), eqI,
            If(Empty, Vector(LocalGet(4), Return), Vector()), // full match
            LocalGet(0), LocalGet(4), addI, LocalGet(5), addI, load8u(),
            LocalGet(2), LocalGet(5), addI, load8u(),
            neI, BrIf(1), // mismatch -> next i
            LocalGet(5), ic(1), addI, LocalSet(5),
            Br(0))))),
        LocalGet(4), ic(1), addI, LocalSet(4),
        Br(0))))),
    ic(-1)))

  /** parseI64(p)->v; sets PARSE_END. locals: 1=neg(i32), 2=acc(i64), 3=c(i32). */
  private val parseBody = FuncBody(Vector(I32, I64, I32), Vector(
    ic(0), LocalSet(1),
    LocalGet(0), load8u(), ic('-'.toInt), eqI,
    If(Empty, Vector(
      ic(1), LocalSet(1),
      LocalGet(0), ic(1), addI, LocalSet(0)), Vector()),
    lc(0L), LocalSet(2),
    Block(Empty, Vector(
      Loop(Empty, Vector(
        LocalGet(0), load8u(), LocalTee(3), ic('0'.toInt), ltI, BrIf(1),
        LocalGet(3), ic('9'.toInt), gtI, BrIf(1),
        LocalGet(2), lc(10L), mulL,
        LocalGet(3), ic('0'.toInt), subI, extendS, addL, LocalSet(2),
        LocalGet(0), ic(1), addI, LocalSet(0),
        Br(0))))),
    LocalGet(0), GlobalSet(PARSE_END),
    LocalGet(1),
    If(I64, Vector(lc(0L), LocalGet(2), subL), Vector(LocalGet(2)))))

  /** writeI64(p,v)->end: decimal itoa. locals: 2=n(i64), 3=len(i32), 4=i(i32). */
  private val writeBody = FuncBody(Vector(I64, I32, I32), Vector(
    LocalGet(1), lc(0L), ltL,
    If(Empty, Vector(
      LocalGet(0), ic('-'.toInt), store8(),
      LocalGet(0), ic(1), addI, LocalSet(0),
      lc(0L), LocalGet(1), subL, LocalSet(1)), Vector()),
    // len = decimal digit count of v (unsigned-safe: v >= 0 here)
    LocalGet(1), LocalSet(2),
    ic(1), LocalSet(3),
    Block(Empty, Vector(
      Loop(Empty, Vector(
        LocalGet(2), lc(10L), ltL, BrIf(1),
        LocalGet(2), lc(10L), divUL, LocalSet(2),
        LocalGet(3), ic(1), addI, LocalSet(3),
        Br(0))))),
    // write digits backwards from p+len-1
    LocalGet(0), LocalGet(3), addI, ic(1), subI, LocalSet(4),
    LocalGet(1), LocalSet(2),
    Block(Empty, Vector(
      Loop(Empty, Vector(
        LocalGet(4),
        LocalGet(2), lc(10L), remUL, Num(0xA7), ic('0'.toInt), addI, // wrap + '0'
        store8(),
        LocalGet(2), lc(10L), divUL, LocalSet(2),
        LocalGet(4), ic(1), subI, LocalSet(4),
        LocalGet(2), lc(0L), Num(0x52), BrIf(0))))), // ne 0 -> continue
    LocalGet(0), LocalGet(3), addI))

  /** mkErr(msgPtr,msgLen)->framePtr. locals: 2=out. */
  private val mkErrBody = FuncBody(Vector(I32), Vector(
    ic(5), LocalGet(1), addI, Call(ALLOC), LocalSet(2),
    LocalGet(2), ic(TypeErr), store8(),
    LocalGet(2), LocalGet(1), store32(1),
    LocalGet(2), ic(5), addI, LocalGet(0), LocalGet(1), MemoryCopy,
    LocalGet(2)))

  /** Shared "parse the named integer field out of a JSON frame" prologue:
   *  emits instructions that leave the FRAME ptr in local `ptr` and the
   *  parsed value in local `v`, or return early (forwarding non-JSON
   *  frames / erroring). Expects locals (ptr,len,pay,idx,numStart) +
   *  v(i64); pattern/msg offsets from the packer. */
  private def parseFieldSeq(ptr: Int, len: Int, pay: Int, idx: Int,
      numStart: Int, v: Int, pat: (Int, Int), noField: (Int, Int),
      noParam: Option[(Int, Int)]): Vector[Instr] = Vector(
    // id != JSON -> forward frame verbatim (EOS / Err / Nil)
    LocalGet(ptr), load8s(), ic(TypeJson), neI,
    If(Empty, Vector(LocalGet(ptr), Return), Vector())) ++
    // parameters must have been set (reference:
    // tests/integration/cli/with_params_errors_test.go message)
    noParam.toVector.flatMap { msg => Vector[Instr](
      GlobalGet(HAS_PARAM), Num(0x45),
      If(Empty, Vector(
        ic(msg._1), ic(msg._2), Call(MKERR), Return), Vector()))
    } ++ Vector(
    LocalGet(ptr), load32(1), LocalSet(len),
    LocalGet(ptr), ic(5), addI, LocalSet(pay),
    LocalGet(pay), LocalGet(len), ic(pat._1), ic(pat._2), Call(FIND),
    LocalTee(idx), ic(0), ltI,
    If(Empty, Vector(
      ic(noField._1), ic(noField._2), Call(MKERR), Return), Vector()),
    LocalGet(pay), LocalGet(idx), addI, ic(pat._2), addI, LocalSet(numStart),
    // skip spaces after the colon
    Block(Empty, Vector(
      Loop(Empty, Vector(
        LocalGet(numStart), load8u(), ic(' '.toInt), neI, BrIf(1),
        LocalGet(numStart), ic(1), addI, LocalSet(numStart),
        Br(0))))),
    LocalGet(numStart), Call(PARSE), LocalSet(v))

  /** set_param body parsing one integer parameter by JSON key. locals:
   *  0=ptr(param), 1=len, 2=pay, 3=idx, 4=p, 5=out. */
  private def setParamBody(pat: (Int, Int), missing: (Int, Int)): FuncBody =
    FuncBody(Vector(I32, I32, I32, I32, I32), Vector(
      LocalGet(0), load8s(), ic(TypeJson), neI,
      If(Empty, Vector(
        ic(missing._1), ic(missing._2), Call(MKERR), Return), Vector()),
      LocalGet(0), load32(1), LocalSet(1),
      LocalGet(0), ic(5), addI, LocalSet(2),
      LocalGet(2), LocalGet(1), ic(pat._1), ic(pat._2), Call(FIND),
      LocalTee(3), ic(0), ltI,
      If(Empty, Vector(
        ic(missing._1), ic(missing._2), Call(MKERR), Return), Vector()),
      LocalGet(2), LocalGet(3), addI, ic(pat._2), addI, LocalSet(4),
      Block(Empty, Vector(
        Loop(Empty, Vector(
          LocalGet(4), load8u(), ic(' '.toInt), neI, BrIf(1),
          LocalGet(4), ic(1), addI, LocalSet(4),
          Br(0))))),
      LocalGet(4), Call(PARSE), GlobalSet(PARAM),
      ic(1), GlobalSet(HAS_PARAM),
      // Nil ack frame (reference set_param returns a readable item;
      // host checks IsError — pipes/protocol.go:31-63)
      ic(1), Call(ALLOC), LocalTee(5),
      ic(TypeNil), store8(),
      LocalGet(5)))

  private def globals(n: Int): Vector[WasmGlobal] =
    Vector.tabulate(n) { i =>
      val vt: Byte = if (i == PARAM) I64 else I32
      WasmGlobal(vt, mutable = true, Vector(
        if (vt == I64) I64Const(0L) else I32Const(0)))
    }

  private def withHeapInit(gs: Vector[WasmGlobal], heapBase: Int): Vector[WasmGlobal] =
    gs.updated(HEAP, gs(HEAP).copy(init = Vector(I32Const(heapBase))))

  private val commonExports = Vector(
    WasmExport("memory", 2, 0),
    WasmExport("alloc", 0, ALLOC))

  // ---------- guest: shift (T2/T3 arithmetic ± inverse, set_param) ----------

  /** Adds `delta` to integer field `field`; `inverse` subtracts.
   *  `viaSatConversions = true` routes the shifted value through the
   *  post-MVP conversion matrix — f64.convert_i64_s → i64.trunc_sat_f64_s
   *  (0xFC 6) → i64.extend32_s (0xC4) — an identity on i32-range values,
   *  so the SAME fixture data must come out unchanged: the conformance
   *  probe for the opcodes modern LLVM/Rust toolchains emit by default.
   *  `viaMultiValueBulk = true` is the companion probe for the other two
   *  post-MVP families LLVM enables by default: the (v, signed-delta)
   *  pair rides a MULTI-VALUE block (func-type blocktype, params carried
   *  through a br) before the add, and each transform runs a
   *  memory.init + data.drop round against a passive data segment —
   *  both identities, so output must again equal the MVP guest's.
   *  `viaFloatPath = true` is the third conformance probe — the FLOAT
   *  tier: the add runs in f64 (`f64.convert_i64_s` both operands,
   *  `f64.add`) and the result passes an identity gauntlet of the float
   *  ops a numeric guest would lean on — `f64.neg ∘ f64.neg`,
   *  `f64.mul` by 1.0, `f64.copysign(f64.abs(x), x)` — before
   *  `i64.trunc_sat_f64_s` brings it back. Exact for |v + δ| < 2⁵³, so
   *  the SAME fixture data must come out unchanged vs the MVP guest.
   *  `viaSimdPath = true` is the fourth conformance probe — the SIMD
   *  tier a `-msimd128` build lands in: the add runs as
   *  `i64x2.splat` × 2 → `i64x2.add`, the sum vector parks in a REAL
   *  v128 LOCAL, round-trips linear memory through `v128.store` /
   *  `v128.load`, and `i64x2.extract_lane 0` brings it back — all
   *  identities, so output must equal the MVP guest's byte-for-byte.
   *  `viaRefTypes = true` is the fifth conformance probe — the
   *  REFERENCE-TYPES tier newer LLVM defaults drift toward: the add
   *  dispatches `call_indirect` through a funcref table the guest
   *  builds AT RUNTIME on first transform — `table.grow` from an empty
   *  table, `table.init` [null, add] from a passive expr-form elem
   *  segment, `elem.drop`, then healing slot 0 with `table.get` +
   *  `ref.is_null` + typed `select` + `ref.func` + `table.set` (a
   *  mis-selected ref leaves slot 0 null and call_indirect TRAPS, so
   *  the probe cannot silently pass). Output must equal the MVP
   *  guest's byte-for-byte.
   *  `viaAtomics = true` is the sixth probe — the THREADS tier a
   *  `-pthread` build lands in, run single-agent: the add round-trips
   *  scratch memory as `i64.atomic.store` → `i64.atomic.rmw.add`
   *  (whose OLD value must equal the stored operand or the sum is
   *  wrong) → `atomic.fence` → `i64.atomic.load`. Identity on the
   *  value path, so output must equal the MVP guest's.
   *  `viaRelaxedSimd = true` is the seventh probe — relaxed-simd under
   *  the deterministic profile: the add runs as
   *  `f64x2.relaxed_madd(splat(v), splat(1.0), splat(δ·sign))` with
   *  `i64.trunc_sat_f64_s` bringing lane 0 back — exact for
   *  |v + δ| < 2⁵³, so the fixture data must come out unchanged. */
  def shiftGuest(field: String, viaSatConversions: Boolean = false,
      viaMultiValueBulk: Boolean = false,
      viaFloatPath: Boolean = false,
      viaSimdPath: Boolean = false,
      viaRefTypes: Boolean = false,
      viaAtomics: Boolean = false,
      viaRelaxedSimd: Boolean = false,
      viaGc: Boolean = false,
      viaGcCast: Boolean = false,
      viaEh: Boolean = false): Array[Byte] = {
    require(Seq(viaFloatPath, viaMultiValueBulk, viaSimdPath, viaRefTypes,
      viaAtomics, viaRelaxedSimd, viaGc, viaGcCast, viaEh)
      .count(identity) <= 1,
      "combine at most one value-path probe")
    val d = new DataPacker
    val pat = d.add("\"" + field + "\":")
    val deltaPat = d.add("\"delta\":")
    val noParam = d.add(NoParamsMsg)
    val noField = d.add(s"field '$field' not found")
    val badParam = d.add("parameter 'delta' missing")
    val TPair = types.size // (i64, i64) -> (i64, i64), multi-value probe
    val TAdd = types.size // (i64, i64) -> i64, ref-types dispatch target
    val TS = types.size // gc probe: struct { mut i64 }
    val TA = types.size + 1 // gc probe: array of mut i64
    val TEhTag = types.size // eh probe: tag payload sig (i64) -> ()
    val TSup = types.size // gc-cast probe: supertype struct { mut i64 }
    val TSc = types.size + 1 // gc-cast probe: declared sub of TSup
    val TAc = types.size + 2 // gc-cast probe: array of mut i64
    val AddFn = 10 // function index of the table-dispatched add
    val passiveSegIdx = 5 // after the 5 active DataPacker segments
    // gc-cast probe's exact abstract heap types (~byte — see RefTest)
    val HtAny = ~(ValType.Anyref & 0xFF)
    val HtI31 = ~(ValType.I31ref & 0xFF)
    val HtStruct = ~(ValType.Structref & 0xFF)
    def guardEq(expect: Int): Vector[Instr] = Vector(
      ic(expect), Num(0x46) /* i32.eq */,
      If(Empty, Vector.empty, Vector(Unreachable)))

    // doShift(sign: i64)->i32
    // locals: 0=sign, 1=ptr, 2=len, 3=pay, 4=idx, 5=numStart, 6=numEnd,
    //         7=out, 8=q, 9=v(i64), [10=bulk scratch]
    val doShift = FuncBody(
      Vector[Byte](I32, I32, I32, I32, I32, I32, I32, I32, I64) ++
        (if (viaMultiValueBulk) Vector[Byte](I32) else Vector.empty[Byte]) ++
        // float-path scratch: 10 = delta*sign (i64), 11 = f64 sum
        (if (viaFloatPath) Vector[Byte](I64, ValType.F64)
         else Vector.empty[Byte]) ++
        // simd-path scratch: 10 = delta*sign (i64), 11 = scratch ptr
        // (i32), 12 = the sum vector (a real v128 local)
        (if (viaSimdPath) Vector[Byte](I64, I32, ValType.V128)
         else Vector.empty[Byte]) ++
        // atomics scratch: 10 = delta*sign, 11 = v (both i64)
        (if (viaAtomics) Vector[Byte](I64, I64) else Vector.empty[Byte]) ++
        // relaxed-simd scratch: 10 = delta*sign (i64)
        (if (viaRelaxedSimd) Vector[Byte](I64) else Vector.empty[Byte]) ++
        // eh scratch: 10 = the sum riding through the throw chain
        (if (viaEh) Vector[Byte](I64) else Vector.empty[Byte]) ++
        // gc scratch: 10 = delta*sign, 11 = the box struct, 12 = the
        // fan-out array (kind-typed ref locals, null-defaulted)
        (if (viaGc || viaGcCast)
           Vector[Byte](I64, ValType.Structref, ValType.Arrayref)
         else Vector.empty[Byte]),
      Vector[Instr](
        ic(d.heapBase), GlobalSet(HEAP), // previous frames consumed: reset
        Call(NEXT), LocalSet(1)) ++
      (if (!viaMultiValueBulk) Vector.empty[Instr] else Vector[Instr](
        // bulk-memory probe (first transform only — a dropped segment
        // traps for len > 0 inits): copy the 4-byte marker from the
        // passive segment into fresh scratch, then release the segment.
        // The scratch is never read — a semantic no-op executing the
        // real 0xFC 8/9 path. PEND (unused by this guest) is the
        // ran-once latch.
        GlobalGet(PEND), Num(0x45) /* i32.eqz */,
        If(Empty, Vector(
          ic(4), Call(ALLOC), LocalSet(10),
          LocalGet(10), ic(0), ic(4), MemoryInit(passiveSegIdx),
          DataDrop(passiveSegIdx),
          ic(1), GlobalSet(PEND)), Vector.empty))) ++
      parseFieldSeq(ptr = 1, len = 2, pay = 3, idx = 4, numStart = 5, v = 9,
        pat = pat, noField = noField, noParam = Some(noParam)) ++
      Vector[Instr](
        GlobalGet(PARSE_END), LocalSet(6),
        LocalGet(9), GlobalGet(PARAM), LocalGet(0), mulL) ++
      // multi-value probe: (v, delta*sign) enter a func-type block as
      // PARAMS and leave it through a br carrying both — identity.
      (if (!viaMultiValueBulk) Vector.empty[Instr] else Vector[Instr](
        Block(-1 - TPair, Vector(Br(0))))) ++
      (if (viaSimdPath) Vector[Instr](
        // stack: v(i64), delta*sign(i64) — the add runs in i64x2 lanes,
        // parks in a v128 local, and round-trips linear memory.
        LocalSet(10),
        SimdOp(18), // i64x2.splat(v)
        LocalGet(10), SimdOp(18), // i64x2.splat(delta*sign)
        SimdOp(206), // i64x2.add
        LocalSet(12),
        ic(16), Call(ALLOC), LocalTee(11),
        LocalGet(12), SimdMem(11, 0, 0), // v128.store
        LocalGet(11), SimdMem(0, 0, 0), // v128.load
        SimdLane(29, 0), // i64x2.extract_lane 0
        LocalSet(9))
      else if (viaAtomics) Vector[Instr](
        // stack: v, delta*sign — the add runs as an atomic rmw round
        // trip through scratch bytes [0, 8) (below DataPacker's 16):
        // store v, rmw.add(d) must return OLD == v, fence, load back
        LocalSet(10), LocalSet(11),
        ic(0), LocalGet(11), AtomicOp(0x18, 3, 0), // i64.atomic.store
        ic(0), LocalGet(10), AtomicOp(0x1F, 3, 0), // i64.atomic.rmw.add
        LocalGet(11), Num(0x51) /* i64.eq: old == v? */,
        If(Empty, Vector.empty, Vector(Unreachable)),
        AtomicFence,
        ic(0), AtomicOp(0x11, 3, 0), // i64.atomic.load -> v + d
        LocalSet(9))
      else if (viaRelaxedSimd) Vector[Instr](
        // stack: v, delta*sign — f64x2.relaxed_madd(splat(v), splat(1),
        // splat(d)) under the deterministic profile, lane 0 back via
        // trunc_sat (exact for |v + d| < 2^53)
        LocalSet(10),
        Num(0xB9), SimdOp(20), // f64x2.splat(f64(v))
        F64Const(java.lang.Double.doubleToRawLongBits(1.0)), SimdOp(20),
        LocalGet(10), Num(0xB9), SimdOp(20),
        SimdOp(263), // f64x2.relaxed_madd
        SimdLane(33, 0), // f64x2.extract_lane 0
        TruncSat(6), // i64.trunc_sat_f64_s
        LocalSet(9))
      else if (viaGc) Vector[Instr](
        // stack: v, delta*sign — the wasm-gc tier (r16): the value is
        // BOXED into a struct field, summed there via struct.get/set,
        // fanned into a 2-element i64 array, and read back from slot 1;
        // an i31 ref.eq identity and an array.len check guard the path
        // (a miss TRAPS, so the probe cannot silently pass)
        LocalSet(10),
        StructNew(TS), LocalSet(11),
        LocalGet(11),
        LocalGet(11), StructGet(TS, 0, 0), LocalGet(10), addL,
        StructSet(TS, 0),
        ic(5), RefI31, ic(5), RefI31, RefEq,
        If(Empty, Vector.empty, Vector(Unreachable)),
        LocalGet(11), StructGet(TS, 0, 0),
        LocalGet(11), StructGet(TS, 0, 0),
        ArrayNewFixed(TA, 2), LocalSet(12),
        LocalGet(12), ArrayLen, ic(2), Num(0x46) /* i32.eq */,
        If(Empty, Vector.empty, Vector(Unreachable)),
        LocalGet(12), ic(1), ArrayGet(TA, 0),
        LocalSet(9))
      else if (viaGcCast) Vector[Instr](
        // stack: v, delta*sign — the r16 GC CAST tier: the value is
        // boxed into the declared SUBTYPE struct, interrogated with
        // precise ref.test (concrete target, declared chain, sibling
        // miss), dispatched through br_on_cast, bounced through the
        // extern hierarchy and ref.cast back, then unboxed with two
        // zero-sum corrections read from a data-SEEDED array
        // (array.new_data + array.init_data) — every op load-bearing:
        // a wrong test, failed cast, or wrong segment byte breaks the
        // oracle hash or traps.
        LocalSet(10),
        StructNew(TSc), LocalSet(11)) ++
        // box is TSc, and TSup via the declared sub chain
        (Vector[Instr](LocalGet(11), RefTest(TSc, nullable = false)) ++
          guardEq(1)) ++
        (Vector[Instr](LocalGet(11), RefTest(TSup, nullable = false)) ++
          guardEq(1)) ++
        (Vector[Instr](LocalGet(11), RefTest(HtStruct, nullable = false)) ++
          guardEq(1)) ++
        (Vector[Instr](LocalGet(11), RefTest(HtI31, nullable = false)) ++
          guardEq(0)) ++
        (Vector[Instr](ic(9), RefI31, RefTest(HtI31, nullable = false)) ++
          guardEq(1)) ++
        // a bare TSup instance is NOT a TSc — the downcast is precise
        (Vector[Instr](StructNewDefault(TSup),
          RefTest(TSc, nullable = false)) ++ guardEq(0)) ++
        Vector[Instr](
          // br_on_cast dispatch: any → TSc branches carrying the box
          Block(ValType.Structref & 0xFF, Vector(
            LocalGet(11),
            BrOnCast(0, HtAny, srcNullable = true, TSc,
              dstNullable = false, onFail = false),
            Unreachable)),
          // extern hierarchy round trip (identity), precise cast home
          ExternConvertAny, AnyConvertExtern,
          RefCast(TSc, nullable = false),
          StructGet(TSc, 0, 0), LocalGet(10), addL,
          // lookup = array.new_data(seg[0, 2)) → [7, 999], then
          // array.init_data patches slot 1 from byte 16 → [7, 100];
          // (lookup[0] - 7) + (lookup[1] - 100) = 0 keeps identity
          ic(0), ic(2), ArrayNewData(TAc, passiveSegIdx), LocalSet(12),
          LocalGet(12), ic(1), ic(16), ic(1),
          ArrayInitData(TAc, passiveSegIdx),
          LocalGet(12), ic(0), ArrayGet(TAc, 0), lc(7L), subL, addL,
          LocalGet(12), ic(1), ArrayGet(TAc, 0), lc(100L), subL, addL,
          LocalSet(9))
      else if (viaEh) Vector[Instr](
        // stack: v, delta*sign — the EH tier (late r16): the sum is
        // THROWN as a tag payload, captured as an exnref by an inner
        // catch_all_ref, RETHROWN via throw_ref, and caught back by the
        // outer tag handler — the whole dispatch chain (tag match, ref
        // capture, rethrow, payload restore) is load-bearing for the
        // oracle hash. Every no-throw path is Unreachable, so a
        // dispatch slip traps rather than silently passing.
        addL,
        LocalSet(10),
        Block(0x7E /* A: result i64 */, Vector(
          TryTable(0x7E, Vector(CatchTag(0, 0)), Vector(
            Block(ValType.Exnref & 0xFF, Vector(
              TryTable(0x7E, Vector(CatchAllRef(0)), Vector(
                LocalGet(10), Throw(0), Unreachable)),
              Unreachable)),
            ThrowRef, Unreachable)),
          Unreachable)),
        LocalSet(9))
      else if (viaRefTypes) Vector[Instr](
        // one-time table build (PEND latch): grow 0→2, init [null, add]
        // from the passive expr-form elem segment, drop it, then heal
        // slot 0 via get/is_null/typed-select/ref.func/set. The two i64
        // operands stay parked on the stack below — all of this is
        // stack-balanced.
        GlobalGet(PEND), Num(0x45) /* i32.eqz */,
        If(Empty, Vector(
          RefNull(0x70), ic(2), TableGrow(0), Drop,
          ic(0), ic(0), ic(2), TableInit(0, 0),
          ElemDrop(0),
          ic(0), // table.set index
          RefFunc(AddFn),
          ic(0), TableGet(0),
          ic(0), TableGet(0), RefIsNull,
          SelectT(Vector(ValType.Funcref)),
          TableSet(0),
          ic(1), GlobalSet(PEND)), Vector.empty),
        ic(0), CallIndirect(TAdd), // slot 0: healed ref or TRAP
        LocalSet(9))
      else if (!viaFloatPath) Vector[Instr](addL, LocalSet(9))
       else Vector[Instr](
        // stack: v(i64), delta*sign(i64) — run the add in f64 and pass
        // the sum through the identity gauntlet before trunc_sat back.
        LocalSet(10),
        Num(0xB9), // f64.convert_i64_s(v)
        LocalGet(10), Num(0xB9), // f64(delta*sign)
        Num(0xA0), // f64.add
        Num(0x9A), Num(0x9A), // neg ∘ neg
        F64Const(java.lang.Double.doubleToRawLongBits(1.0)), Num(0xA2), // ×1.0
        LocalTee(11),
        Num(0x99), // f64.abs(sum)
        LocalGet(11), Num(0xA6), // f64.copysign(abs, sum) == sum
        TruncSat(6), // i64.trunc_sat_f64_s
        LocalSet(9))) ++
      (if (!viaSatConversions) Vector.empty[Instr] else Vector[Instr](
        LocalGet(9), Num(0xB9), TruncSat(6), Num(0xC4), LocalSet(9))) ++
      Vector[Instr](
        // out frame: worst case len + 21 digits
        ic(26), LocalGet(2), addI, Call(ALLOC), LocalSet(7),
        LocalGet(7), ic(5), addI, LocalSet(8),
        // prefix
        LocalGet(8), LocalGet(3), LocalGet(5), LocalGet(3), subI, MemoryCopy,
        LocalGet(8), LocalGet(5), LocalGet(3), subI, addI, LocalSet(8),
        // number
        LocalGet(8), LocalGet(9), Call(WRITE), LocalSet(8),
        // suffix
        LocalGet(8), LocalGet(6),
        LocalGet(3), LocalGet(2), addI, LocalGet(6), subI, MemoryCopy,
        LocalGet(8), LocalGet(3), LocalGet(2), addI, LocalGet(6), subI, addI,
        LocalSet(8),
        // frame header
        LocalGet(7), ic(TypeJson), store8(),
        LocalGet(7), LocalGet(8), LocalGet(7), subI, ic(5), subI, store32(1),
        LocalGet(7)))

    val transform = FuncBody(Vector(), Vector(lc(1L), Call(F6)))
    val inverse = FuncBody(Vector(), Vector(lc(-1L), Call(F6)))

    WasmBinary.encode(WasmModule(
      types =
        if (viaMultiValueBulk)
          types :+ FuncType(Vector(I64, I64), Vector(I64, I64))
        else if (viaRefTypes)
          types :+ FuncType(Vector(I64, I64), Vector(I64))
        else if (viaGc) // sentinels under the struct/array comp entries
          types :+ FuncType(Vector.empty, Vector.empty) :+
            FuncType(Vector.empty, Vector.empty)
        else if (viaGcCast)
          types ++ Vector.fill(3)(FuncType(Vector.empty, Vector.empty))
        else if (viaEh)
          types :+ FuncType(Vector(I64), Vector.empty) // the tag's sig
        else types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr, // 1..5
        TShift, TNoArgPtr, TNoArgPtr, TPtrPtr) ++ // 6=doShift 7=transform 8=inverse 9=set_param
        (if (viaRefTypes) Vector(TAdd) else Vector.empty), // 10=addFn
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(
        globals(if (viaMultiValueBulk || viaRefTypes) 5 else 4), d.heapBase),
      exports = commonExports ++ Vector(
        WasmExport("transform", 0, F6 + 1),
        WasmExport("inverse", 0, F6 + 2),
        WasmExport("set_param", 0, F6 + 3)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        doShift, transform, inverse, setParamBody(deltaPat, badParam)) ++
        (if (viaRefTypes) Vector(
          FuncBody(Vector(), Vector(LocalGet(0), LocalGet(1), addL)))
         else Vector.empty),
      datas = if (viaMultiValueBulk)
        d.segments :+ DataSeg(-1, "mvb!".getBytes(UTF_8).toVector, passive = true)
      else if (viaGcCast) {
        // three LE i64 lanes: [7, 999, 100] — new_data reads the first
        // two, init_data patches slot 1 from byte 16
        def le64(v: Long): Vector[Byte] =
          Vector.tabulate(8)(j => ((v >>> (8 * j)) & 0xFF).toByte)
        d.segments :+ DataSeg(-1, le64(7L) ++ le64(999L) ++ le64(100L),
          passive = true)
      } else d.segments,
      start = None,
      tables = if (viaRefTypes)
        Vector(TableType(ValType.Funcref, 0, Some(4))) else Vector.empty,
      elems = if (viaRefTypes)
        Vector(ElemSeg(-1, Vector(-1, AddFn), mode = 1)) else Vector.empty,
      comps = if (viaGc)
        types.map(t => CFunc(t): CompType) :+
          CStruct(Vector(FieldType(I64, mutable = true))) :+
          CArray(FieldType(I64, mutable = true))
      else if (viaGcCast)
        types.map(t => CFunc(t): CompType) :+
          CStruct(Vector(FieldType(I64, mutable = true))) :+ // TSup
          CStruct(Vector(FieldType(I64, mutable = true))) :+ // TSc <: TSup
          CArray(FieldType(I64, mutable = true)) // TAc
      else Vector.empty,
      superTypes = if (viaGcCast)
        Vector.fill(types.size + 3)(-1).updated(TSc, TSup)
      else Vector.empty,
      tags = if (viaEh) Vector(WasmTag(TEhTag)) else Vector.empty))
  }

  // ---------- guest: filter (1:<=1 pull loop, set_param) ----------

  /** Keeps items whose integer `field` >= `min` (set_param), forwarding
   *  the winning frame verbatim; pulls past rejected items. */
  def filterGuest(field: String): Array[Byte] = {
    val d = new DataPacker
    val pat = d.add("\"" + field + "\":")
    val minPat = d.add("\"min\":")
    val noParam = d.add(NoParamsMsg)
    val noField = d.add(s"field '$field' not found")
    val badParam = d.add("parameter 'min' missing")

    // transform()->i32
    // locals: 1=ptr, 2=len, 3=pay, 4=idx, 5=numStart, 9=v(i64); 0 and 6-8
    // unused (keeps parseFieldSeq's local numbering shared with shiftGuest)
    val transform = FuncBody(
      Vector(I32, I32, I32, I32, I32, I32, I32, I32, I32, I64),
      Vector[Instr](
        Loop(Empty,
          Vector[Instr](
            ic(d.heapBase), GlobalSet(HEAP), // rejected frames do not accumulate
            Call(NEXT), LocalSet(1)) ++
          parseFieldSeq(ptr = 1, len = 2, pay = 3, idx = 4, numStart = 5, v = 9,
            pat = pat, noField = noField, noParam = Some(noParam)) ++
          Vector[Instr](
            LocalGet(9), GlobalGet(PARAM), geL,
            If(Empty, Vector(LocalGet(1), Return), Vector()),
            Br(0))),
        Unreachable))

    WasmBinary.encode(WasmModule(
      types = types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr,
        TNoArgPtr, TPtrPtr), // 6=transform 7=set_param
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(globals(4), d.heapBase),
      exports = commonExports ++ Vector(
        WasmExport("transform", 0, F6),
        WasmExport("set_param", 0, F6 + 1)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        transform, setParamBody(minPat, badParam)),
      datas = d.segments,
      start = None))
  }

  // ---------- guest: repeat (buffered 1:N, set_param) ----------

  /** Emits each pulled JSON item `times` times — pending count carried in
   *  guest globals across transform calls (the normalize module's
   *  buffered-queue contract). */
  def repeatGuest(): Array[Byte] = {
    val d = new DataPacker
    val timesPat = d.add("\"times\":")
    val noParam = d.add(NoParamsMsg)
    val badParam = d.add("parameter 'times' missing")

    // transform()->i32. locals: 1=ptr.
    val transform = FuncBody(Vector(I32, I32), Vector(
      GlobalGet(PEND), ic(0), gtI,
      If(Empty, Vector(
        GlobalGet(PEND), ic(1), subI, GlobalSet(PEND),
        GlobalGet(PEND_PTR), Return), Vector()),
      ic(d.heapBase), GlobalSet(HEAP), // pending frame drained: reset
      Call(NEXT), LocalSet(1),
      LocalGet(1), load8s(), ic(TypeJson), neI,
      If(Empty, Vector(LocalGet(1), Return), Vector()),
      GlobalGet(HAS_PARAM), Num(0x45),
      If(Empty, Vector(
        ic(noParam._1), ic(noParam._2), Call(MKERR), Return), Vector()),
      LocalGet(1), GlobalSet(PEND_PTR),
      GlobalGet(PARAM), Num(0xA7), ic(1), subI, GlobalSet(PEND),
      LocalGet(1)))

    WasmBinary.encode(WasmModule(
      types = types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr,
        TNoArgPtr, TPtrPtr), // 6=transform 7=set_param
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(globals(6), d.heapBase),
      exports = commonExports ++ Vector(
        WasmExport("transform", 0, F6),
        WasmExport("set_param", 0, F6 + 1)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        transform, setParamBody(timesPat, badParam)),
      datas = d.segments,
      start = None))
  }

  // ---------- guest: rename (T1/T4 with inverse) ----------

  /** Renames JSON field `src` to `dst` by byte-splicing the first key
   *  occurrence; `inverse` renames back — the reference's rename module
   *  with its error message (reference:
   *  tests/modules/rust_wasm32_rename/src/lib.rs:31-37). */
  def renameGuest(src: String, dst: String): Array[Byte] = {
    val d = new DataPacker
    val srcPat = d.add("\"" + src + "\":")
    val dstPat = d.add("\"" + dst + "\":")
    val notFound = d.add("The requested property was not found")

    // doRename(spatPtr, spatLen, dpatPtr, dpatLen) -> i32  (type TFind)
    // locals: 4=ptr, 5=len, 6=pay, 7=idx, 8=out, 9=q
    val doRename = FuncBody(Vector(I32, I32, I32, I32, I32, I32), Vector(
      ic(d.heapBase), GlobalSet(HEAP),
      Call(NEXT), LocalSet(4),
      LocalGet(4), load8s(), ic(TypeJson), neI,
      If(Empty, Vector(LocalGet(4), Return), Vector()),
      LocalGet(4), load32(1), LocalSet(5),
      LocalGet(4), ic(5), addI, LocalSet(6),
      LocalGet(6), LocalGet(5), LocalGet(0), LocalGet(1), Call(FIND),
      LocalTee(7), ic(0), ltI,
      If(Empty, Vector(
        ic(notFound._1), ic(notFound._2), Call(MKERR), Return), Vector()),
      ic(13), LocalGet(5), addI, LocalGet(3), addI, Call(ALLOC), LocalSet(8),
      LocalGet(8), ic(5), addI, LocalSet(9),
      // prefix
      LocalGet(9), LocalGet(6), LocalGet(7), MemoryCopy,
      LocalGet(9), LocalGet(7), addI, LocalSet(9),
      // replacement key
      LocalGet(9), LocalGet(2), LocalGet(3), MemoryCopy,
      LocalGet(9), LocalGet(3), addI, LocalSet(9),
      // suffix
      LocalGet(9),
      LocalGet(6), LocalGet(7), addI, LocalGet(1), addI,
      LocalGet(5), LocalGet(7), subI, LocalGet(1), subI, MemoryCopy,
      LocalGet(9), LocalGet(5), LocalGet(7), subI, LocalGet(1), subI, addI,
      LocalSet(9),
      LocalGet(8), ic(TypeJson), store8(),
      LocalGet(8), LocalGet(9), LocalGet(8), subI, ic(5), subI, store32(1),
      LocalGet(8)))

    val transform = FuncBody(Vector(), Vector(
      ic(srcPat._1), ic(srcPat._2), ic(dstPat._1), ic(dstPat._2), Call(F6)))
    val inverse = FuncBody(Vector(), Vector(
      ic(dstPat._1), ic(dstPat._2), ic(srcPat._1), ic(srcPat._2), Call(F6)))

    WasmBinary.encode(WasmModule(
      types = types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr,
        TFind, TNoArgPtr, TNoArgPtr), // 6=doRename 7=transform 8=inverse
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(globals(4), d.heapBase),
      exports = commonExports ++ Vector(
        WasmExport("transform", 0, F6 + 1),
        WasmExport("inverse", 0, F6 + 2)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        doRename, transform, inverse),
      datas = d.segments,
      start = None))
  }

  // ---------- guest: normalize (buffered 1:N explode, T6) ----------

  // globals 4-7 (normalize guest): the pending-array scan state
  private val ARR_POS = 4 // i32 mut: scan position inside the array span (0 = none)
  private val ARR_END = 5 // i32 mut: position of the closing ']'
  private val NAME_PTR = 6 // i32 mut: book-name string span start
  private val NAME_LEN = 7 // i32 mut

  /** The reference's normalize module semantics as bytecode:
   *  `Book{Name, PageNumbers[]}` → one `Page{BookName, Number}` per array
   *  element, the remainder buffered in guest state across transform
   *  calls; an empty array yields a Nil item, and a Nil input forwards as
   *  Nil (reference: tests/modules/rust_wasm32_normalize/src/lib.rs:22-78).
   *  The heap resets only when the pending array drains, so memory is
   *  bounded by one book's frames. */
  def normalizeGuest(): Array[Byte] = {
    val d = new DataPacker
    val patName = d.add("\"Name\":")
    val patPages = d.add("\"PageNumbers\":")
    val lit1 = d.add("{\"BookName\":\"")
    val lit2 = d.add("\",\"Number\":")
    val noName = d.add("field 'Name' not found")
    val noPages = d.add("field 'PageNumbers' not found")

    // skip spaces/commas at ARR_POS up to ARR_END (inline sequence)
    val skipSeps: Vector[Instr] = Vector(
      Block(Empty, Vector(
        Loop(Empty, Vector(
          GlobalGet(ARR_POS), GlobalGet(ARR_END), geI, BrIf(1),
          GlobalGet(ARR_POS), load8u(), LocalTee(0),
          ic(' '.toInt), eqI,
          LocalGet(0), ic(','.toInt), eqI,
          Num(0x72), // or
          Num(0x45), BrIf(1), // neither -> stop
          GlobalGet(ARR_POS), ic(1), addI, GlobalSet(ARR_POS),
          Br(0))))))

    // emitElem() -> i32: one Page frame from the element at ARR_POS.
    // locals: 0=numStart, 1=p, 2=out, 3=q, 4=c
    val emitElem = FuncBody(Vector(I32, I32, I32, I32, I32), Vector(
      GlobalGet(ARR_POS), LocalTee(0), LocalSet(1),
      Block(Empty, Vector(
        Loop(Empty, Vector(
          LocalGet(1), GlobalGet(ARR_END), geI, BrIf(1),
          LocalGet(1), load8u(), LocalTee(4), ic('-'.toInt), eqI,
          If(Empty, Vector(
            LocalGet(1), ic(1), addI, LocalSet(1), Br(1)), Vector()),
          LocalGet(4), ic('0'.toInt), ltI, BrIf(1),
          LocalGet(4), ic('9'.toInt), gtI, BrIf(1),
          LocalGet(1), ic(1), addI, LocalSet(1),
          Br(0))))),
      LocalGet(1), GlobalSet(ARR_POS),
      // out = alloc(5 + 13 + NAME_LEN + 11 + numLen + 1)
      ic(30), GlobalGet(NAME_LEN), addI,
      LocalGet(1), LocalGet(0), subI, addI, Call(ALLOC), LocalSet(2),
      LocalGet(2), ic(5), addI, LocalSet(3),
      LocalGet(3), ic(lit1._1), ic(lit1._2), MemoryCopy,
      LocalGet(3), ic(lit1._2), addI, LocalSet(3),
      LocalGet(3), GlobalGet(NAME_PTR), GlobalGet(NAME_LEN), MemoryCopy,
      LocalGet(3), GlobalGet(NAME_LEN), addI, LocalSet(3),
      LocalGet(3), ic(lit2._1), ic(lit2._2), MemoryCopy,
      LocalGet(3), ic(lit2._2), addI, LocalSet(3),
      LocalGet(3), LocalGet(0), LocalGet(1), LocalGet(0), subI, MemoryCopy,
      LocalGet(3), LocalGet(1), LocalGet(0), subI, addI, LocalSet(3),
      LocalGet(3), ic('}'.toInt), store8(),
      LocalGet(3), ic(1), addI, LocalSet(3),
      LocalGet(2), ic(TypeJson), store8(),
      LocalGet(2), LocalGet(3), LocalGet(2), subI, ic(5), subI, store32(1),
      LocalGet(2)))

    // transform() -> i32
    // locals: 0=c(skipSeps scratch), 1=ptr, 2=len, 3=pay, 4=i, 5=p, 6=q
    val transform = FuncBody(Vector(I32, I32, I32, I32, I32, I32, I32),
      Vector[Instr](
        GlobalGet(ARR_POS), Num(0x45), // pending array?
        If(Empty, Vector(), // none -> fall to pull
          skipSeps ++ Vector[Instr](
            GlobalGet(ARR_POS), GlobalGet(ARR_END), ltI,
            If(Empty, Vector(Call(F6), Return), Vector()),
            ic(0), GlobalSet(ARR_POS)))) ++ // drained -> pull a new book
      Vector[Instr](
        ic(d.heapBase), GlobalSet(HEAP),
        Call(NEXT), LocalSet(1),
        // EOS/Err forwarded; Nil input -> Nil output (reference behavior)
        LocalGet(1), load8s(), ic(TypeJson), neI,
        If(Empty, Vector(LocalGet(1), Return), Vector()),
        LocalGet(1), load32(1), LocalSet(2),
        LocalGet(1), ic(5), addI, LocalSet(3),
        // Name string span
        LocalGet(3), LocalGet(2), ic(patName._1), ic(patName._2), Call(FIND),
        LocalTee(4), ic(0), ltI,
        If(Empty, Vector(
          ic(noName._1), ic(noName._2), Call(MKERR), Return), Vector()),
        LocalGet(3), LocalGet(4), addI, ic(patName._2), addI, LocalSet(5),
        Block(Empty, Vector(
          Loop(Empty, Vector(
            LocalGet(5), load8u(), ic(' '.toInt), neI, BrIf(1),
            LocalGet(5), ic(1), addI, LocalSet(5), Br(0))))),
        LocalGet(5), load8u(), ic('"'.toInt), neI,
        If(Empty, Vector(
          ic(noName._1), ic(noName._2), Call(MKERR), Return), Vector()),
        LocalGet(5), ic(1), addI, LocalTee(5), GlobalSet(NAME_PTR),
        LocalGet(5), LocalSet(6),
        Block(Empty, Vector(
          Loop(Empty, Vector(
            LocalGet(6), load8u(), ic('"'.toInt), eqI, BrIf(1),
            LocalGet(6), ic(1), addI, LocalSet(6), Br(0))))),
        LocalGet(6), LocalGet(5), subI, GlobalSet(NAME_LEN),
        // PageNumbers array span
        LocalGet(3), LocalGet(2), ic(patPages._1), ic(patPages._2), Call(FIND),
        LocalTee(4), ic(0), ltI,
        If(Empty, Vector(
          ic(noPages._1), ic(noPages._2), Call(MKERR), Return), Vector()),
        LocalGet(3), LocalGet(4), addI, ic(patPages._2), addI, LocalSet(5),
        Block(Empty, Vector(
          Loop(Empty, Vector(
            LocalGet(5), load8u(), ic(' '.toInt), neI, BrIf(1),
            LocalGet(5), ic(1), addI, LocalSet(5), Br(0))))),
        LocalGet(5), load8u(), ic('['.toInt), neI,
        If(Empty, Vector(
          ic(noPages._1), ic(noPages._2), Call(MKERR), Return), Vector()),
        LocalGet(5), ic(1), addI, LocalTee(5), GlobalSet(ARR_POS),
        LocalGet(5), LocalSet(6),
        Block(Empty, Vector(
          Loop(Empty, Vector(
            LocalGet(6), load8u(), ic(']'.toInt), eqI, BrIf(1),
            LocalGet(6), ic(1), addI, LocalSet(6), Br(0))))),
        LocalGet(6), GlobalSet(ARR_END)) ++
      skipSeps ++ Vector[Instr](
        GlobalGet(ARR_POS), GlobalGet(ARR_END), ltI,
        If(Empty, Vector(Call(F6), Return), Vector()),
        // empty array: one Nil item, exactly like the reference
        ic(0), GlobalSet(ARR_POS),
        ic(1), Call(ALLOC), LocalTee(1),
        ic(TypeNil), store8(),
        LocalGet(1)))

    WasmBinary.encode(WasmModule(
      types = types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr,
        TNoArgPtr, TNoArgPtr), // 6=emitElem 7=transform
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(globals(8), d.heapBase),
      exports = commonExports ++ Vector(WasmExport("transform", 0, F6 + 1)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        emitElem, transform),
      datas = d.segments,
      start = None))
  }

  // ---------- guest: counter (stateful T7, no params) ----------

  /** REPLACES integer `field` with a 1-based per-instance counter that
   *  advances across transform calls — mutable guest state held in a
   *  wasm global, the reference's stateful counter module (reference:
   *  tests/modules/rust_wasm32_counter/src/lib.rs:26-54). Order-dependent
   *  by design: drive serially (one partition) for a deterministic
   *  sequence, exactly as the reference's single-threaded pull stream. */
  def counterGuest(field: String): Array[Byte] = {
    val d = new DataPacker
    val pat = d.add("\"" + field + "\":")
    val noField = d.add(s"field '$field' not found")

    // transform()->i32 — shiftGuest's splice with v = ++PARAM (the
    // counter) instead of parsed+delta.
    // locals: 1=ptr, 2=len, 3=pay, 4=idx, 5=numStart, 6=numEnd, 7=out,
    //         8=q, 9=v(i64); 0 unused
    val transform = FuncBody(
      Vector(I32, I32, I32, I32, I32, I32, I32, I32, I32, I64),
      Vector[Instr](
        ic(d.heapBase), GlobalSet(HEAP),
        Call(NEXT), LocalSet(1)) ++
      parseFieldSeq(ptr = 1, len = 2, pay = 3, idx = 4, numStart = 5, v = 9,
        pat = pat, noField = noField, noParam = None) ++
      Vector[Instr](
        GlobalGet(PARSE_END), LocalSet(6),
        GlobalGet(PARAM), lc(1L), addL, GlobalSet(PARAM),
        GlobalGet(PARAM), LocalSet(9),
        ic(26), LocalGet(2), addI, Call(ALLOC), LocalSet(7),
        LocalGet(7), ic(5), addI, LocalSet(8),
        LocalGet(8), LocalGet(3), LocalGet(5), LocalGet(3), subI, MemoryCopy,
        LocalGet(8), LocalGet(5), LocalGet(3), subI, addI, LocalSet(8),
        LocalGet(8), LocalGet(9), Call(WRITE), LocalSet(8),
        LocalGet(8), LocalGet(6),
        LocalGet(3), LocalGet(2), addI, LocalGet(6), subI, MemoryCopy,
        LocalGet(8), LocalGet(3), LocalGet(2), addI, LocalGet(6), subI, addI,
        LocalSet(8),
        LocalGet(7), ic(TypeJson), store8(),
        LocalGet(7), LocalGet(8), LocalGet(7), subI, ic(5), subI, store32(1),
        LocalGet(7)))

    WasmBinary.encode(WasmModule(
      types = types,
      imports = Vector(WasmImport("lens", "next", TNoArgPtr)),
      funcTypeIdxs = Vector(TPtrPtr, TFind, TParse, TWrite, TMkErr,
        TNoArgPtr), // 6=transform
      memMinPages = 2,
      memMaxPages = None,
      globals = withHeapInit(globals(4), d.heapBase),
      exports = commonExports ++ Vector(WasmExport("transform", 0, F6)),
      codes = Vector(allocBody, findBody, parseBody, writeBody, mkErrBody,
        transform),
      datas = d.segments,
      start = None))
  }
}
