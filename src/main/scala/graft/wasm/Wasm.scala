package graft.wasm

import java.io.ByteArrayOutputStream

/**
 * WebAssembly MVP binary format — instruction AST + decoder + encoder.
 *
 * P5 closure: the reference executes lens modules as real WebAssembly
 * (reference: host-go/runtimes/wasmtime/runtime.go:164-227 and the
 * wazero/wasmer/js siblings). No WASM runtime resolves offline in this
 * container, so graft ships its own: this file models the public
 * WebAssembly 1.0 binary format (https://webassembly.github.io/spec/core/
 * binary/), [[WasmInterp]] evaluates it, and [[WasmAsm]] assembles guest
 * modules from the same AST — giving a bit-level round-trip property
 * (decode(encode(m)) == m) that pins both directions.
 *
 * Scope: the full WebAssembly 1.0 numeric/control/memory matrix — every
 * i32/i64/f32/f64 instruction including the spec's trapping float→int
 * truncations and ties-to-even rounding, structured control flow, calls
 * (direct, host imports, and call_indirect through funcref tables),
 * mutable globals, linear memory with grow + bulk copy/fill, data and
 * element segments, plus the post-MVP tiers LLVM output reaches:
 * sign-extension, saturating truncation, bulk memory, multi-value,
 * simd128, reference types, relaxed-simd (deterministic profile) and
 * single-agent atomics. [[WasmValidate]] runs the spec's validation
 * before execution. Not implemented, rejected by FEATURE name at
 * decode: wasm-gc heap/composite types, multiple memories — neither
 * appears in the reference's guest SDKs (sdk-rust/src/lib.rs,
 * sdk-assemblyscript).
 *
 * 100 TB shape: a module is a few KB of bytes broadcast with the closure;
 * decode happens once per (executor, module) via [[WasmInterp.moduleOf]]'s
 * cache, execution is per-partition with zero driver involvement.
 */
sealed trait Instr

// ---- control ----
case object Unreachable extends Instr
case object Nop extends Instr
/** blockType: 0x40 = empty; a valtype byte (0x7C–0x7F) = one result; a
 *  NEGATIVE value encodes a function-type index as `-1 - typeIdx`
 *  (multi-value blocks — spec §5.4.1 s33 blocktype: non-negative s33 =
 *  type index, mapped to negatives here so the common byte forms keep
 *  their MVP Int representation). */
final case class Block(blockType: Int, body: Vector[Instr]) extends Instr
final case class Loop(blockType: Int, body: Vector[Instr]) extends Instr
final case class If(blockType: Int, thn: Vector[Instr], els: Vector[Instr]) extends Instr
final case class Br(depth: Int) extends Instr
final case class BrIf(depth: Int) extends Instr
final case class BrTable(targets: Vector[Int], default: Int) extends Instr
case object Return extends Instr
final case class Call(funcIdx: Int) extends Instr
/** Indirect call through a funcref table (how compiled Rust/AS guests
 *  dispatch trait objects / function pointers); `tableIdx` is the
 *  reference-types multi-table immediate (0 in MVP modules). */
final case class CallIndirect(typeIdx: Int, tableIdx: Int = 0) extends Instr

// ---- parametric / variable ----
case object Drop extends Instr
case object Select extends Instr
final case class LocalGet(idx: Int) extends Instr
final case class LocalSet(idx: Int) extends Instr
final case class LocalTee(idx: Int) extends Instr
final case class GlobalGet(idx: Int) extends Instr
final case class GlobalSet(idx: Int) extends Instr

// ---- memory ----
/** `op` is the raw opcode byte (0x28–0x35 loads, 0x36–0x3E stores). */
final case class MemLoad(op: Int, align: Int, offset: Int) extends Instr
final case class MemStore(op: Int, align: Int, offset: Int) extends Instr
case object MemorySize extends Instr
case object MemoryGrow extends Instr
case object MemoryCopy extends Instr
case object MemoryFill extends Instr
/** 0xFC 8/9 (bulk-memory): copy from / release a passive data segment. */
final case class MemoryInit(segIdx: Int) extends Instr
final case class DataDrop(segIdx: Int) extends Instr

// ---- numeric ----
final case class I32Const(v: Int) extends Instr
final case class I64Const(v: Long) extends Instr
final case class F32Const(bits: Int) extends Instr
final case class F64Const(bits: Long) extends Instr
/** Every no-immediate numeric opcode (0x45–0xC4), dispatched by byte. */
final case class Num(op: Int) extends Instr
/** Saturating float→int truncation (0xFC subopcodes 0–7 — post-MVP,
 *  emitted by default by modern LLVM/Rust toolchains): NaN → 0,
 *  out-of-range clamps to the type bounds instead of trapping. */
final case class TruncSat(sub: Int) extends Instr

// ---- simd128 (0xFD prefix; fixed-width 128-bit vectors) ----
/** No-immediate SIMD op, dispatched by subopcode. */
final case class SimdOp(sub: Int) extends Instr
/** SIMD memory op (loads 0–10, store 11, load_zero 92–93). */
final case class SimdMem(sub: Int, align: Int, offset: Int) extends Instr
/** v128.const: 16 little-endian bytes. */
final case class SimdConst(bytes: Vector[Byte]) extends Instr
/** i8x16.shuffle: 16 lane indices (0–31). */
final case class SimdShuffle(lanes: Vector[Int]) extends Instr
/** Lane-immediate op (extract/replace, subs 21–34). */
final case class SimdLane(sub: Int, lane: Int) extends Instr
/** Lane memory op (subs 84–91). */
final case class SimdMemLane(sub: Int, align: Int, offset: Int,
    lane: Int) extends Instr

object ValType {
  val I32: Byte = 0x7F
  val I64: Byte = 0x7E
  val F32: Byte = 0x7D
  val F64: Byte = 0x7C
  val V128: Byte = 0x7B
  val Funcref: Byte = 0x70
  val Externref: Byte = 0x6F
  // wasm-gc tier (r16): the abstract heap-type bytes double as
  // nullable-reference valtype shorthands (GC spec §5.3.4). This
  // engine types GC references at KIND level: a concrete
  // (ref [null] $t) valtype COARSENS at decode to its composite kind
  // byte (Funcref / Structref / Arrayref) — precise enough to reject
  // cross-kind misuse, while struct field/array element types stay
  // fully tracked per concrete type through the instruction
  // immediates. Documented model, not an accident.
  val Anyref: Byte = 0x6E
  val Eqref: Byte = 0x6D
  val I31ref: Byte = 0x6C
  val Structref: Byte = 0x6B
  val Arrayref: Byte = 0x6A
  val Noneref: Byte = 0x71
  val NoExternref: Byte = 0x72
  val NoFuncref: Byte = 0x73
  /** EH tier: exception references form their OWN hierarchy (exn with
   *  bottom noexn) — never under any/func/extern. */
  val Exnref: Byte = 0x69
  /** packed STORAGE types (struct field / array element position only,
   *  never on the operand stack; unpacked view is I32). */
  val PackedI8: Byte = 0x78
  val PackedI16: Byte = 0x77
  /** blockType byte for "no result". */
  val Empty: Int = 0x40
  def isRef(vt: Byte): Boolean = vt == Funcref || vt == Externref ||
    (vt >= Arrayref && vt <= Anyref) || vt == Noneref ||
    vt == NoExternref || vt == NoFuncref || vt == Exnref
  def isPacked(st: Byte): Boolean = st == PackedI8 || st == PackedI16
  /** a field's operand-stack type (packed i8/i16 load/store as i32). */
  def unpacked(st: Byte): Byte = if (isPacked(st)) I32 else st
  /** Kind-level reference subtyping: none <: i31/struct/array <: eq
   *  <: any; nofunc <: func; noextern <: extern. */
  def subRef(a: Byte, b: Byte): Boolean = a == b || (b match {
    case Anyref => a == Eqref || a == I31ref || a == Structref ||
      a == Arrayref || a == Noneref
    case Eqref => a == I31ref || a == Structref || a == Arrayref ||
      a == Noneref
    case I31ref | Structref | Arrayref => a == Noneref
    case Funcref => a == NoFuncref
    case Externref => a == NoExternref
    case _ => false
  })
  /** Hierarchy top of a reference kind byte: any-hierarchy kinds meet
   *  at anyref, func kinds at funcref, extern kinds at externref. */
  def hierTop(k: Byte): Byte = k match {
    case Funcref | NoFuncref => Funcref
    case Externref | NoExternref => Externref
    case Exnref => Exnref
    case _ => Anyref
  }
}

// reference-types tier (r14): funcref/externref values, table
// instructions, typed select. Refs live in the 64-bit slot model as
// Longs: -1 = null, otherwise a function index (funcref) or an opaque
// host value (externref — never -1 from this host).
final case class RefNull(heapType: Int) extends Instr
case object RefIsNull extends Instr
final case class RefFunc(funcIdx: Int) extends Instr
final case class TableGet(tableIdx: Int) extends Instr
final case class TableSet(tableIdx: Int) extends Instr
final case class TableInit(elemIdx: Int, tableIdx: Int) extends Instr
final case class ElemDrop(elemIdx: Int) extends Instr
final case class TableCopy(dstTable: Int, srcTable: Int) extends Instr
final case class TableGrow(tableIdx: Int) extends Instr
final case class TableSize(tableIdx: Int) extends Instr
final case class TableFill(tableIdx: Int) extends Instr
/** Typed select (0x1C) — operationally identical to Select; the type
 *  annotation exists for validators. */
final case class SelectT(types: Vector[Byte]) extends Instr

// threads tier (r14, single-agent semantics): 0xFE-prefixed atomic
// memory accesses execute sequentially — exact for a single-instance
// engine, where no concurrent agent exists by construction. `sub` is
// the 0xFE subopcode (notify 0x00, wait32/64 0x01/0x02, loads
// 0x10–0x16, stores 0x17–0x1D, rmw 0x1E–0x47, cmpxchg 0x48–0x4E).
final case class AtomicOp(sub: Int, align: Int, offset: Int) extends Instr
/** atomic.fence (0xFE 0x03) — a no-op under single-agent execution. */
case object AtomicFence extends Instr

// wasm-gc tier (r16): the scalar-shaped allocation/access subset —
// i31 references (unboxed, tag-encoded in the 64-bit slot model),
// struct and array heap objects (an arena per instance, reclaimed at
// each outermost invocation — see WasmInterp's gcHeap discipline).
// `sign`: 0 = plain get, 1 = `_s`, 2 = `_u` (packed fields only).
final case class StructNew(typeIdx: Int) extends Instr
final case class StructNewDefault(typeIdx: Int) extends Instr
final case class StructGet(typeIdx: Int, field: Int, sign: Int) extends Instr
final case class StructSet(typeIdx: Int, field: Int) extends Instr
final case class ArrayNew(typeIdx: Int) extends Instr
final case class ArrayNewDefault(typeIdx: Int) extends Instr
final case class ArrayNewFixed(typeIdx: Int, n: Int) extends Instr
final case class ArrayGet(typeIdx: Int, sign: Int) extends Instr
final case class ArraySet(typeIdx: Int) extends Instr
case object ArrayLen extends Instr
final case class ArrayFill(typeIdx: Int) extends Instr
final case class ArrayCopy(dstTypeIdx: Int, srcTypeIdx: Int) extends Instr
/** ref.i31 (0xFB 28): i31 refs are UNBOXED — no heap object. */
case object RefI31 extends Instr
final case class I31Get(signed: Boolean) extends Instr
/** ref.eq (0xD3): identity on eqref values (i31 tag bits included). */
case object RefEq extends Instr

/** wasm-gc ref.test / ref.cast (0xFB 20–23). `ht` is an EXACT heap
 *  type: >= 0 a concrete type index (tests are PRECISE — runtime
 *  objects carry their type index and declared `sub` chains resolve),
 *  < 0 the bitwise NOT of an abstract heap-type byte. */
final case class RefTest(ht: Int, nullable: Boolean) extends Instr
final case class RefCast(ht: Int, nullable: Boolean) extends Instr
/** br_on_cast (0xFB 24) / br_on_cast_fail (0xFB 25): test the top ref
 *  against `dstHt` and branch with it on success (failure for
 *  `onFail`), falling through with it otherwise. */
final case class BrOnCast(depth: Int, srcHt: Int, srcNullable: Boolean,
    dstHt: Int, dstNullable: Boolean, onFail: Boolean) extends Instr
/** any.convert_extern (0xFB 26) / extern.convert_any (0xFB 27):
 *  identity on this engine's 64-bit slot encoding (null stays null) —
 *  the ops exist to move a value between the any and extern
 *  hierarchies, which share one representation here. */
case object AnyConvertExtern extends Instr
case object ExternConvertAny extends Instr
// exception-handling tier (late r16) — the STANDARDIZED EH proposal
// (tags + throw/throw_ref + try_table + exnref), what
// -fwasm-exceptions C++ toolchains emit; the superseded legacy
// try/catch opcodes (0x06/0x07/0x09/0x18/0x19) stay named rejections.
/** throw $tag (0x08): pop the tag's payload, unwind to the nearest
 *  matching try_table catch (or out of the invocation as a trap). */
final case class Throw(tagIdx: Int) extends Instr
/** throw_ref (0x0A): rethrow a caught exception package. */
case object ThrowRef extends Instr
/** One try_table catch clause; `label` is resolved in the context
 *  ENCLOSING the try_table (spec validation rule — the try_table's own
 *  label is not in scope for its catches). */
sealed trait CatchClause { def label: Int }
final case class CatchTag(tag: Int, label: Int) extends CatchClause
final case class CatchTagRef(tag: Int, label: Int) extends CatchClause
final case class CatchAll(label: Int) extends CatchClause
final case class CatchAllRef(label: Int) extends CatchClause
/** try_table (0x1F): a block whose body's thrown exceptions dispatch
 *  through `catches` in order — payload (and for the _ref forms the
 *  exnref) is pushed at the catch target label. */
final case class TryTable(blockType: Int, catches: Vector[CatchClause],
    body: Vector[Instr]) extends Instr

// function-references tier (late r16) — the call shapes wasm-gc
// toolchains emit beyond plain call/call_indirect. Tail calls run with
// CONSTANT JVM stack: the evaluator propagates a tail signal to the
// frame loop instead of recursing (see WasmInterp.invokeByIndex0).
/** call_ref $t (0x14): call through a typed function-reference value. */
final case class CallRef(typeIdx: Int) extends Instr
/** return_call (0x12) / return_call_indirect (0x13) /
 *  return_call_ref (0x15): tail calls — the callee's results ARE the
 *  caller's, with the caller's frame discarded first. */
final case class ReturnCall(funcIdx: Int) extends Instr
final case class ReturnCallIndirect(typeIdx: Int,
    tableIdx: Int = 0) extends Instr
final case class ReturnCallRef(typeIdx: Int) extends Instr
/** ref.as_non_null (0xD4): trap on null, pass otherwise. */
case object RefAsNonNull extends Instr
/** br_on_null (0xD5): branch WITHOUT the ref when null, fall through
 *  with it otherwise. br_on_non_null (0xD6): branch WITH the ref when
 *  non-null, fall through without it otherwise. */
final case class BrOnNull(depth: Int) extends Instr
final case class BrOnNonNull(depth: Int) extends Instr

/** Segment-seeded arrays: array.new_data / array.new_elem
 *  (0xFB 9/10) read [offset, size) of a data / elem segment at
 *  allocation; array.init_data / array.init_elem (0xFB 18/19) patch a
 *  slice of an existing array from one. */
final case class ArrayNewData(typeIdx: Int, dataIdx: Int) extends Instr
final case class ArrayNewElem(typeIdx: Int, elemIdx: Int) extends Instr
final case class ArrayInitData(typeIdx: Int, dataIdx: Int) extends Instr
final case class ArrayInitElem(typeIdx: Int, elemIdx: Int) extends Instr

/** GC composite-type field: `storage` is a valtype byte or a packed
 *  byte (i8 0x78 / i16 0x77); reference storage is kind-coarsened like
 *  every other valtype in this engine. */
final case class FieldType(storage: Byte, mutable: Boolean)
/** GC composite type (one per type index). Func entries mirror
 *  `WasmModule.types`; struct/array entries carry their fields and
 *  leave a ()→() sentinel at the same index of `types`. */
sealed trait CompType
final case class CFunc(ft: FuncType) extends CompType
final case class CStruct(fields: Vector[FieldType]) extends CompType
final case class CArray(elem: FieldType) extends CompType

final case class FuncType(params: Vector[Byte], results: Vector[Byte])
/** Function imports only — the lens ABI imports exactly one host function
 *  (`lens.next`, reference: host-go/runtimes/wasmtime/runtime.go:87-91). */
final case class WasmImport(module: String, name: String, typeIdx: Int)
final case class WasmGlobal(valType: Byte, mutable: Boolean, init: Vector[Instr])
/** kind: 0 = func, 2 = memory (the two the lens ABI exports);
 *  4 = exception tag (EH tier). */
final case class WasmExport(name: String, kind: Int, idx: Int)
/** Exception tag (EH tier): `typeIdx` names a func type with EMPTY
 *  results — the tag's payload signature. */
final case class WasmTag(typeIdx: Int)
final case class FuncBody(locals: Vector[Byte], body: Vector[Instr])
/** `passive = true` (bulk-memory): no offset expr — the segment sits
 *  inert until `memory.init` copies from it / `data.drop` releases it. */
final case class DataSeg(offset: Int, bytes: Vector[Byte],
    passive: Boolean = false)
/** One table's static type (reference-types: any count, funcref or
 *  externref element type, optional max). */
final case class TableType(elemType: Byte, min: Int, max: Option[Int])

/** Element segment, all 8 spec flavors normalized: `items` hold
 *  function indices with -1 for `ref.null` (the only non-funcidx const
 *  expr this decoder accepts); `mode` 0 = active, 1 = passive,
 *  2 = declarative. Defaults keep the MVP shape
 *  (`ElemSeg(offset, funcIdxs)`) source-compatible. */
final case class ElemSeg(offset: Int, funcIdxs: Vector[Int],
    tableIdx: Int = 0, mode: Int = 0, elemType: Byte = 0x70)

final case class WasmModule(
    types: Vector[FuncType],
    imports: Vector[WasmImport],
    funcTypeIdxs: Vector[Int],
    memMinPages: Int,
    memMaxPages: Option[Int],
    globals: Vector[WasmGlobal],
    exports: Vector[WasmExport],
    codes: Vector[FuncBody],
    datas: Vector[DataSeg],
    start: Option[Int],
    tables: Vector[TableType] = Vector.empty,
    elems: Vector[ElemSeg] = Vector.empty,
    comps: Vector[CompType] = Vector.empty,
    superTypes: Vector[Int] = Vector.empty,
    tags: Vector[WasmTag] = Vector.empty,
    mem64: Boolean = false) {
  def export(name: String): Option[WasmExport] = exports.find(_.name == name)
  /** The composite type at index `i`; a module with no GC forms (comps
   *  empty — every pre-GC construction site) is all-func. */
  def comp(i: Int): CompType =
    if (comps.isEmpty) CFunc(types(i)) else comps(i)
  /** Declared supertype of type `i` (`sub` forms, r16), -1 = none.
   *  Empty vector = no type declares one (the normalized form both
   *  decode and every pre-GC construction site produce). */
  def superOf(i: Int): Int = if (superTypes.isEmpty) -1 else superTypes(i)
}

class WasmDecodeError(msg: String) extends RuntimeException(msg)
/** Validation rejection ([[WasmValidate]]) — a subclass of
 *  [[WasmDecodeError]] so every module-load guard catches both: the
 *  bytes decoded, but the module breaks the spec's type/index
 *  discipline and must not execute. */
final class WasmValidateError(msg: String) extends WasmDecodeError(msg)
final class WasmTrap(msg: String) extends RuntimeException(msg)

/** Binary-format decoder (WebAssembly spec §5). Stateless; pure function
 *  of the module bytes. */
object WasmBinary {

  val Magic: Array[Byte] = Array(0x00, 0x61, 0x73, 0x6D).map(_.toByte)
  val Version: Array[Byte] = Array(0x01, 0x00, 0x00, 0x00).map(_.toByte)

  def isWasm(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(4).sameElements(Magic)

  // ---------- decoding ----------

  private final class Reader(val b: Array[Byte], var pos: Int) {
    def u8(): Int = {
      if (pos >= b.length) throw new WasmDecodeError(
        s"truncated module: read past end at byte $pos")
      val v = b(pos) & 0xFF; pos += 1; v
    }
    def u32(): Int = {
      var result = 0L; var shift = 0; var byte = 0
      do {
        byte = u8()
        result |= (byte & 0x7FL) << shift
        shift += 7
      } while ((byte & 0x80) != 0)
      result.toInt
    }
    /** Unsigned LEB up to 64 bits (memory64 limits). */
    def u64(): Long = {
      var result = 0L; var shift = 0; var byte = 0
      do {
        byte = u8()
        result |= (byte & 0x7FL) << shift
        shift += 7
      } while ((byte & 0x80) != 0)
      result
    }
    def s64(): Long = {
      var result = 0L; var shift = 0; var byte = 0
      do {
        byte = u8()
        result |= (byte & 0x7FL) << shift
        shift += 7
      } while ((byte & 0x80) != 0)
      if (shift < 64 && (byte & 0x40) != 0) result |= -1L << shift
      result
    }
    def s32(): Int = s64().toInt
    /** blocktype (spec §5.4.1, an s33): 0x40/valtype single bytes keep
     *  their byte value; a non-negative s33 (function-type index, the
     *  multi-value form) maps to `-1 - idx`. */
    /** Comp-type KINDS per type index (0 func / 1 struct / 2 array),
     *  set once the type section is decoded — concrete heap-type
     *  indices in later sections resolve through it. Instance state of
     *  the per-decode Reader, so the decoder object stays stateless. */
    var typeKinds: Array[Int] = Array.emptyIntArray
    def blocktype(): Int = {
      val v = s64()
      if (v >= 0) -1 - v.toInt
      else (v.toInt & 0x7F) match {
        // only 0x40 (empty) and the valtype bytes are legal negative
        // blocktypes — an unvetted byte here would thread an opaque
        // "type" through validation frames as if legitimate
        case b if b == 0x40 || (b >= 0x7B && b <= 0x7F) ||
          b == 0x70 || b == 0x6F => b
        case b if b == 0x6E || b == 0x6D || b == 0x6C || b == 0x6B ||
          b == 0x6A || b == 0x71 || b == 0x72 || b == 0x73 ||
          b == 0x69 => b
        case b if b == 0x63 || b == 0x64 =>
          heapKindByte(this, s64(), "blocktype") & 0xFF
        case other => throw new WasmDecodeError(
          f"bad blocktype value type 0x$other%02X")
      }
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n.toLong > b.length) throw new WasmDecodeError(
        s"truncated module: $n bytes requested at $pos of ${b.length}")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    def name(): String = new String(bytes(u32()), java.nio.charset.StandardCharsets.UTF_8)
    def hasMore: Boolean = pos < b.length
  }

  def decode(moduleBytes: Array[Byte]): WasmModule = {
    if (!isWasm(moduleBytes) ||
        !moduleBytes.slice(4, 8).sameElements(Version))
      throw new WasmDecodeError("not a wasm v1 module (bad magic/version)")
    val r = new Reader(moduleBytes, 8)

    var types = Vector.empty[FuncType]
    var imports = Vector.empty[WasmImport]
    var funcTypeIdxs = Vector.empty[Int]
    var memMin = 0
    var memMax = Option.empty[Int]
    var globals = Vector.empty[WasmGlobal]
    var exports = Vector.empty[WasmExport]
    var codes = Vector.empty[FuncBody]
    var datas = Vector.empty[DataSeg]
    var tags = Vector.empty[WasmTag]
    var start = Option.empty[Int]
    var tables = Vector.empty[TableType]
    var elems = Vector.empty[ElemSeg]
    var comps = Vector.empty[CompType]
    var superTypes = Vector.empty[Int]
    // spec: at most one memory across the import and memory sections —
    // without this, section 5 would silently overwrite imported limits
    var seenMemory = false
    var mem64 = false

    def readMemLimits(r: Reader): Unit = {
      if (seenMemory) throw new WasmDecodeError(
        "duplicate memory: a module may declare or import at most one")
      seenMemory = true
      val flags = r.u8()
      if (flags > 7) throw new WasmDecodeError(
        s"bad memory limits flags $flags")
      // memory64 (late r16): flags bit 2 = i64 index type. The limits
      // are u64 LEBs, but the engine's 16384-page (1 GiB) cap applies
      // either way, so oversized minima reject by name below.
      mem64 = (flags & 4) != 0
      // threads spec: a SHARED memory (flags bit 1) must declare a max
      if ((flags & 3) == 2) throw new WasmDecodeError(
        "shared memory without a declared max (threads spec requires one)")
      def pages(): Int = {
        val v = if (mem64) r.u64() else r.u32().toLong
        if (v < 0 || v > 16384) throw new WasmDecodeError(
          s"memory limit $v pages exceeds this engine's 16384-page " +
            "(1 GiB) cap")
        v.toInt
      }
      memMin = checkedMemPages(pages())
      memMax = if ((flags & 1) != 0) Some(pages()) else None
      memMax.foreach { mx =>
        if (mx < memMin) throw new WasmDecodeError(
          s"bad memory limits: max $mx < min $memMin")
        // reject above-cap declared maxima at DECODE by name: silently
        // clamping at memory.grow would diverge from wasmtime/wazero
        // (a guest probing the grow result would see -1 where the
        // reference runtimes succeed) without any signal
        if (mx > 16384) throw new WasmDecodeError(
          s"memory max $mx pages exceeds this engine's 16384-page " +
            "(1 GiB) cap")
      }
    }

    while (r.hasMore) {
      val id = r.u8()
      val size = r.u32()
      if (size < 0 || r.pos.toLong + size > moduleBytes.length)
        throw new WasmDecodeError(
          s"truncated module: section $id claims $size bytes at ${r.pos} " +
            s"of ${moduleBytes.length}")
      val end = r.pos + size
      id match {
        case 1 => // type: func + wasm-gc composite forms (r16)
          val sectionStart = r.pos
          // PASS 1 — comp KINDS per type index (0 func / 1 struct /
          // 2 array): a concrete (ref $t) inside the section may
          // forward-reference a type later in its rec group, so kinds
          // must be known before any reference type resolves
          locally {
            val kinds = Vector.newBuilder[Int]
            def skipValtype(): Unit = {
              val b = r.u8() & 0xFF
              if (b == 0x63 || b == 0x64) { r.s64(); () }
            }
            def skipField(): Unit = { skipValtype(); r.u8(); () }
            def scanSub(tag0: Int): Unit = {
              var tag = tag0
              if (tag == 0x4F || tag == 0x50) {
                var j = r.u32()
                while (j > 0) { r.u32(); j -= 1 }
                tag = r.u8()
              }
              tag match {
                case 0x60 =>
                  kinds += 0
                  var j = r.u32(); while (j > 0) { skipValtype(); j -= 1 }
                  j = r.u32(); while (j > 0) { skipValtype(); j -= 1 }
                case 0x5F =>
                  kinds += 1
                  var j = r.u32(); while (j > 0) { skipField(); j -= 1 }
                case 0x5E =>
                  kinds += 2
                  skipField()
                case t => throw new WasmDecodeError(
                  f"bad composite type tag 0x$t%02X")
              }
            }
            var ri = r.u32()
            while (ri > 0) {
              val tag = r.u8()
              if (tag == 0x4E) {
                var k = r.u32()
                while (k > 0) { scanSub(r.u8()); k -= 1 }
              } else scanSub(tag)
              ri -= 1
            }
            r.typeKinds = kinds.result().toArray
          }
          // PASS 2 — full decode with concrete heap types resolvable
          r.pos = sectionStart
          locally {
            val tBuf = Vector.newBuilder[FuncType]
            val cBuf = Vector.newBuilder[CompType]
            val sBuf = Vector.newBuilder[Int]
            var sawGc = false
            def decodeSub(tag0: Int): Unit = {
              var tag = tag0
              var sup = -1
              if (tag == 0x4F || tag == 0x50) {
                sawGc = true
                // supertype bounds are KEPT (r16): ref.test/ref.cast
                // resolve declared chains at runtime. The spec caps the
                // vector at one entry (GC spec §3.4.6).
                val j = r.u32()
                if (j > 1) throw new WasmDecodeError(
                  s"subtype declares $j supertypes (spec limit is 1)")
                if (j == 1) {
                  val s = r.u32()
                  if (s < 0 || s >= r.typeKinds.length)
                    throw new WasmDecodeError(
                      s"subtype supertype index $s of ${r.typeKinds.length}")
                  sup = s
                }
                tag = r.u8()
              }
              sBuf += sup
              tag match {
                case 0x60 =>
                  val params = Vector.fill(r.u32())(checkedValtype(r))
                  val results = Vector.fill(r.u32())(checkedValtype(r))
                  val ft = FuncType(params, results)
                  tBuf += ft
                  cBuf += CFunc(ft)
                case 0x5F =>
                  sawGc = true
                  cBuf += CStruct(Vector.fill(r.u32())(fieldType(r)))
                  tBuf += FuncType(Vector.empty, Vector.empty) // sentinel
                case 0x5E =>
                  sawGc = true
                  cBuf += CArray(fieldType(r))
                  tBuf += FuncType(Vector.empty, Vector.empty) // sentinel
                case t => throw new WasmDecodeError(
                  f"bad composite type tag 0x$t%02X")
              }
            }
            var ri = r.u32()
            while (ri > 0) {
              val tag = r.u8()
              if (tag == 0x4E) {
                sawGc = true
                var k = r.u32()
                while (k > 0) { decodeSub(r.u8()); k -= 1 }
              } else decodeSub(tag)
              ri -= 1
            }
            types = tBuf.result()
            comps = if (sawGc) cBuf.result() else Vector.empty
            val supers = sBuf.result()
            superTypes =
              if (supers.exists(_ != -1)) supers else Vector.empty
          }
        case 2 => // import
          val nImp = r.u32()
          val impBuf = Vector.newBuilder[WasmImport]
          var ii = 0
          while (ii < nImp) {
            val mod = r.name(); val nm = r.name()
            r.u8() match {
              case 0x00 => impBuf += WasmImport(mod, nm, r.u32())
              case 0x02 =>
                // memory IMPORT — the shape a `-pthread` build emits
                // (env.memory, shared). In a single-instance engine the
                // instance owns a fresh memory with the imported limits:
                // no second agent exists to share with, so this is the
                // exact single-agent semantics. Only FUNCTION imports
                // join the func index space.
                readMemLimits(r)
              case 0x04 => throw new WasmDecodeError(
                s"tag import $mod.$nm not supported by this engine " +
                  "(declare tags in the module)")
              case k => throw new WasmDecodeError(
                s"unsupported import kind $k for $mod.$nm " +
                  "(functions and memory)")
            }
            ii += 1
          }
          imports = impBuf.result()
        case 3 => // function
          funcTypeIdxs = Vector.fill(r.u32())(r.u32())
        case 4 => // table (reference-types: any count, funcref/externref)
          tables = Vector.fill(r.u32()) {
            val et = r.u8()
            if (et != 0x70 && et != 0x6F)
              throw new WasmDecodeError(f"bad table element type 0x$et%02X")
            val flags = r.u8()
            val min = r.u32()
            // attacker-controlled size feeds Array.fill at instantiation:
            // reject implausible (or LEB-wrapped-negative) mins by NAME
            if (min < 0 || min > (1 << 22)) throw new WasmDecodeError(
              s"table min $min exceeds this engine's 2^22-slot cap")
            val max = if ((flags & 1) != 0) Some(r.u32()) else None
            max.foreach { m =>
              if (m < 0 || m < min) throw new WasmDecodeError(
                s"bad table limits: max $m < min $min")
              // reject above-cap declared maxima at DECODE by name —
              // same contract as the memory cap: no silent table.grow
              // divergence from the reference runtimes
              if (m > (1 << 22)) throw new WasmDecodeError(
                s"table max $m exceeds this engine's 2^22-slot cap")
            }
            TableType(et.toByte, min, max)
          }
        case 5 => // memory
          val n = r.u32()
          if (n > 1) throw new WasmDecodeError("multiple memories unsupported")
          // flags bit 1 = SHARED (threads tier): accepted (with the
          // spec-required max) and treated as a plain memory —
          // single-agent execution makes the distinction unobservable
          if (n == 1) readMemLimits(r)
        case 6 => // global
          globals = Vector.fill(r.u32()) {
            val vt = checkedValtype(r)
            val mut = r.u8() == 1
            WasmGlobal(vt, mut, decodeExpr(r))
          }
        case 7 => // export
          exports = Vector.fill(r.u32()) {
            WasmExport(r.name(), r.u8(), r.u32())
          }
        case 8 => start = Some(r.u32())
        case 9 => // elem: all 8 reference-types flavors (spec §5.5.12)
          elems = Vector.fill(r.u32()) {
            val flag = r.u32()
            if (flag < 0 || flag > 7)
              throw new WasmDecodeError(s"bad elem segment flag $flag")
            val mode = // bit0 set: passive (bit1 clear) or declarative
              if ((flag & 1) == 0) 0 else if ((flag & 2) == 0) 1 else 2
            val tableIdx = if (flag == 2 || flag == 6) r.u32() else 0
            val offset =
              if (mode == 0) decodeExpr(r) match {
                case Vector(I32Const(v)) => v
                case other =>
                  throw new WasmDecodeError(s"bad elem offset expr $other")
              } else -1
            var elemType: Byte = 0x70
            if ((flag & 4) == 0) { // funcidx vector form
              if (flag == 1 || flag == 2 || flag == 3) {
                val kind = r.u8()
                if (kind != 0x00) throw new WasmDecodeError(
                  s"bad elemkind $kind (only funcref 0x00)")
              }
              ElemSeg(offset, Vector.fill(r.u32())(r.u32()), tableIdx, mode)
            } else { // expr vector form: ref.func k | ref.null
              if (flag != 4) {
                val rt = r.u8()
                if (rt != 0x70 && rt != 0x6F) throw new WasmDecodeError(
                  f"bad elem reftype 0x$rt%02X")
                elemType = rt.toByte
              }
              val items = Vector.fill(r.u32()) {
                decodeExpr(r) match {
                  case Vector(RefFunc(k)) => k
                  case Vector(RefNull(_)) => -1
                  case other => throw new WasmDecodeError(
                    s"unsupported elem item expr $other")
                }
              }
              ElemSeg(offset, items, tableIdx, mode, elemType)
            }
          }
        case 10 => // code
          codes = Vector.fill(r.u32()) {
            val bodySize = r.u32()
            val bodyEnd = r.pos + bodySize
            val locals = Vector.fill(r.u32()) {
              val count = r.u32(); val vt = checkedValtype(r)
              Vector.fill(count)(vt)
            }.flatten
            val body = decodeExpr(r)
            if (r.pos != bodyEnd)
              throw new WasmDecodeError("code body size mismatch")
            FuncBody(locals, body)
          }
        case 11 => // data
          datas = Vector.fill(r.u32()) {
            r.u32() match {
              case 0 => // active, memory 0
                val off = decodeExpr(r) match {
                  case Vector(I32Const(v)) => v
                  // memory64: active offsets are i64 consts; the engine
                  // cap (1 GiB) bounds them to Int range, checked here
                  case Vector(I64Const(v)) if mem64 =>
                    if (v < 0 || v > (16384L << 16)) throw new WasmDecodeError(
                      s"data offset $v outside the 1 GiB memory64 cap")
                    v.toInt
                  case other => throw new WasmDecodeError(s"bad data offset expr $other")
                }
                DataSeg(off, r.bytes(r.u32()).toVector)
              case 1 => // passive (bulk-memory): no offset expr
                DataSeg(-1, r.bytes(r.u32()).toVector, passive = true)
              case flag => throw new WasmDecodeError(
                s"only active-mem-0 and passive data segments supported (flag $flag)")
            }
          }
        case 13 => // tag (EH tier): attribute byte must be 0 (exception)
          tags = Vector.fill(r.u32()) {
            val attr = r.u8()
            if (attr != 0) throw new WasmDecodeError(
              s"tag attribute $attr (only exception tags exist)")
            WasmTag(r.u32())
          }
        case _ => // custom / table / elem / datacount: skip
      }
      r.pos = end
    }
    WasmModule(types, imports, funcTypeIdxs, memMin, memMax, globals,
      exports, codes, datas, start, tables, elems, comps, superTypes,
      tags, mem64)
  }

  /** Value type with a NAMED rejection for anything outside the tiers
   *  this interpreter executes (MVP + v128 + r14's reference types —
   *  funcref 0x70 / externref 0x6F are first-class values now). The
   *  reference's real runtimes — wasmtime/wazero/wasmer under
   *  host-go/runtimes — accept any valid module, so the error message
   *  is the compat surface for what remains (threads, relaxed-simd,
   *  GC types). */
  private def checkedValtype(r: Reader): Byte = (r.u8() & 0xFF) match {
    case vt if vt >= 0x7B && vt <= 0x7F => vt.toByte // i32 i64 f32 f64 v128
    case vt if vt == 0x70 || vt == 0x6F => vt.toByte // funcref, externref
    // wasm-gc (r16): abstract heap-type bytes are nullable-ref valtype
    // shorthands; a concrete (ref [null] $t) coarsens to its composite
    // KIND byte — the engine's documented kind-level typing model
    case vt if vt == 0x6E || vt == 0x6D || vt == 0x6C || vt == 0x6B ||
      vt == 0x6A || vt == 0x71 || vt == 0x72 || vt == 0x73 => vt.toByte
    case vt if vt == 0x69 => vt.toByte // exnref (EH tier, late r16)
    case vt if vt == 0x63 || vt == 0x64 =>
      heapKindByte(r, r.s64(),
        if (vt == 0x63) "(ref null ht)" else "(ref ht)")
    case vt if gcHeapTypeName(vt) != null => throw new WasmDecodeError(
      f"wasm-gc heap type ${gcHeapTypeName(vt)} (0x$vt%02X) not supported " +
        "by this engine")
    case other => throw new WasmDecodeError(
      f"bad value type 0x$other%02X")
  }

  /** Resolve a heap-type s33 to an EXACT representation for
   *  ref.test/ref.cast/br_on_cast: a concrete index stays the index
   *  (>= 0, range-checked — runtime tests on it are precise); an
   *  abstract heap type becomes the bitwise NOT of its byte (< 0),
   *  with unknown bytes rejected by name via [[heapKindByte]]. */
  private def heapTypeExact(r: Reader, where: String): Int = {
    val ht = r.s64()
    if (ht >= 0) {
      if (ht >= r.typeKinds.length) throw new WasmDecodeError(
        s"$where: heap type index $ht of ${r.typeKinds.length}")
      ht.toInt
    } else ~(heapKindByte(r, ht, where) & 0xFF)
  }

  /** Resolve a heap-type s33 to the engine's kind-level valtype byte:
   *  a concrete index takes its composite kind; abstract heap types
   *  keep their byte. Exception-handling / continuation heap types
   *  reject by name. */
  private def heapKindByte(r: Reader, ht: Long, where: String): Byte =
    if (ht >= 0) {
      if (ht >= r.typeKinds.length) throw new WasmDecodeError(
        s"$where: heap type index $ht of ${r.typeKinds.length}")
      r.typeKinds(ht.toInt) match {
        case 1 => ValType.Structref
        case 2 => ValType.Arrayref
        case _ => ValType.Funcref
      }
    } else (ht.toInt & 0x7F) match {
      case 0x70 => ValType.Funcref
      case 0x6F => ValType.Externref
      case 0x6E => ValType.Anyref
      case 0x6D => ValType.Eqref
      case 0x6C => ValType.I31ref
      case 0x6B => ValType.Structref
      case 0x6A => ValType.Arrayref
      case 0x71 => ValType.Noneref
      case 0x72 => ValType.NoExternref
      case 0x73 => ValType.NoFuncref
      case 0x69 => ValType.Exnref // EH tier (late r16)
      case other => throw new WasmDecodeError(
        f"$where: unsupported heap type 0x$other%02X")
    }

  /** GC field type: storage (valtype or packed i8/i16) + mutability. */
  private def fieldType(r: Reader): FieldType = {
    if (r.pos >= r.b.length) throw new WasmDecodeError(
      s"truncated module: field type at ${r.pos}")
    val peek = r.b(r.pos) & 0xFF
    val storage: Byte =
      if (peek == 0x78 || peek == 0x77) { r.u8(); peek.toByte }
      else checkedValtype(r)
    val mut = r.u8() match {
      case 0 => false
      case 1 => true
      case m => throw new WasmDecodeError(s"bad field mutability flag $m")
    }
    FieldType(storage, mut)
  }

  /** wasm-gc abstract heap type names (GC spec §5.3.2 absheaptype) —
   *  recognized so a GC-typed module rejects by FEATURE name rather
   *  than a generic bad-byte error; null for non-GC bytes. */
  private def gcHeapTypeName(b: Int): String = b match {
    case 0x6A => "array"
    case 0x6B => "struct"
    case 0x6C => "i31"
    case 0x6D => "eq"
    case 0x6E => "any"
    case 0x71 => "none"
    case 0x72 => "noextern"
    case 0x73 => "nofunc"
    case _ => null
  }

  /** Decode an instruction sequence up to (and consuming) `end` (0x0B).
   *  Returns the instructions; `else` handled inside `if`. */
  /** Static memory min-pages bound: `min * 64Ki` feeds one JVM byte
   *  array at instantiation, so an attacker-controlled min must not
   *  overflow Int (32768 pages = 2 GiB does) or allocate executor-
   *  killing sizes. 16384 pages = 1 GiB — far above any real guest;
   *  larger declared mins fail by NAME at decode. Growth past the
   *  static min stays governed by memory.grow's own cap. */
  private def checkedMemPages(min: Int): Int = {
    if (min < 0 || min > 16384) throw new WasmDecodeError(
      s"memory min $min pages exceeds this engine's 16384-page (1 GiB) cap")
    min
  }

  /** Max valid lane immediate per simd128 lane-indexed subopcode:
   *  extract/replace 21–34 (i8x16/i16x8/i32x4/i64x2/f32x4/f64x2) and
   *  load/store-lane 84–91 (8/16/32/64-bit lanes). */
  private def simdLaneCap(sub: Int): Int = sub match {
    case 21 | 22 | 23 => 16 // i8x16 extract_s/extract_u/replace
    case 24 | 25 | 26 => 8  // i16x8 extract_s/extract_u/replace
    case 27 | 28 => 4       // i32x4 extract/replace
    case 29 | 30 => 2       // i64x2 extract/replace
    case 31 | 32 => 4       // f32x4 extract/replace
    case 33 | 34 => 2       // f64x2 extract/replace
    case 84 | 88 => 16      // v128.load8_lane / store8_lane
    case 85 | 89 => 8       // v128.load16_lane / store16_lane
    case 86 | 90 => 4       // v128.load32_lane / store32_lane
    case 87 | 91 => 2       // v128.load64_lane / store64_lane
  }

  private def decodeExpr(r: Reader): Vector[Instr] = {
    val (body, terminator) = decodeSeq(r)
    if (terminator != 0x0B) throw new WasmDecodeError("expected end opcode")
    body
  }

  private def decodeSeq(r: Reader): (Vector[Instr], Int) = {
    val out = Vector.newBuilder[Instr]
    while (true) {
      val op = r.u8()
      op match {
        case 0x0B | 0x05 => return (out.result(), op) // end | else
        case 0x00 => out += Unreachable
        case 0x01 => out += Nop
        case 0x02 =>
          val bt = r.blocktype()
          val (body, t) = decodeSeq(r)
          if (t != 0x0B) throw new WasmDecodeError("block: expected end")
          out += Block(bt, body)
        case 0x03 =>
          val bt = r.blocktype()
          val (body, t) = decodeSeq(r)
          if (t != 0x0B) throw new WasmDecodeError("loop: expected end")
          out += Loop(bt, body)
        case 0x04 =>
          val bt = r.blocktype()
          val (thn, t) = decodeSeq(r)
          val els =
            if (t == 0x05) {
              val (e, t2) = decodeSeq(r)
              if (t2 != 0x0B) throw new WasmDecodeError("if/else: expected end")
              e
            } else Vector.empty[Instr]
          out += If(bt, thn, els)
        case 0x08 => out += Throw(r.u32())
        case 0x0A => out += ThrowRef
        case 0x1F =>
          val bt = r.blocktype()
          val catches = Vector.fill(r.u32()) {
            (r.u8() & 0xFF) match {
              case 0 =>
                val t = r.u32()
                CatchTag(t, r.u32()): CatchClause
              case 1 =>
                val t = r.u32()
                CatchTagRef(t, r.u32())
              case 2 => CatchAll(r.u32())
              case 3 => CatchAllRef(r.u32())
              case k => throw new WasmDecodeError(
                s"try_table: unknown catch kind $k")
            }
          }
          val (body, t) = decodeSeq(r)
          if (t != 0x0B) throw new WasmDecodeError("try_table: expected end")
          out += TryTable(bt, catches, body)
        case legacy if legacy == 0x06 || legacy == 0x07 ||
            legacy == 0x09 || legacy == 0x18 || legacy == 0x19 =>
          throw new WasmDecodeError(
            f"legacy exception-handling opcode 0x$legacy%02X not " +
              "supported by this engine (use the standardized " +
              "try_table form)")
        case 0x0C => out += Br(r.u32())
        case 0x0D => out += BrIf(r.u32())
        case 0x0E =>
          val targets = Vector.fill(r.u32())(r.u32())
          out += BrTable(targets, r.u32())
        case 0x0F => out += Return
        case 0x10 => out += Call(r.u32())
        case 0x11 =>
          val typeIdx = r.u32()
          out += CallIndirect(typeIdx, r.u32()) // reference-types tableidx
        case 0x12 => out += ReturnCall(r.u32())
        case 0x13 =>
          val typeIdx = r.u32()
          out += ReturnCallIndirect(typeIdx, r.u32())
        case 0x14 => out += CallRef(r.u32())
        case 0x15 => out += ReturnCallRef(r.u32())
        case 0x1A => out += Drop
        case 0x1B => out += Select
        case 0x1C => // typed select (reference-types)
          out += SelectT(Vector.fill(r.u32())(checkedValtype(r)))
        case 0x20 => out += LocalGet(r.u32())
        case 0x21 => out += LocalSet(r.u32())
        case 0x22 => out += LocalTee(r.u32())
        case 0x23 => out += GlobalGet(r.u32())
        case 0x24 => out += GlobalSet(r.u32())
        case ld if ld >= 0x28 && ld <= 0x35 =>
          out += MemLoad(ld, r.u32(), r.u32())
        case st if st >= 0x36 && st <= 0x3E =>
          out += MemStore(st, r.u32(), r.u32())
        case 0x3F => r.u8(); out += MemorySize
        case 0x40 => r.u8(); out += MemoryGrow
        case 0x41 => out += I32Const(r.s32())
        case 0x42 => out += I64Const(r.s64())
        case 0x43 =>
          val b = r.bytes(4)
          out += F32Const(
            (b(0) & 0xFF) | (b(1) & 0xFF) << 8 | (b(2) & 0xFF) << 16 | (b(3) & 0xFF) << 24)
        case 0x44 =>
          val b = r.bytes(8)
          var bits = 0L
          var i = 7
          while (i >= 0) { bits = (bits << 8) | (b(i) & 0xFFL); i -= 1 }
          out += F64Const(bits)
        case 0xFC =>
          r.u32() match {
            case sat if sat >= 0 && sat <= 7 => out += TruncSat(sat)
            case 8 =>
              val seg = r.u32(); r.u8(); out += MemoryInit(seg)
            case 9 => out += DataDrop(r.u32())
            case 10 => r.u8(); r.u8(); out += MemoryCopy
            case 11 => r.u8(); out += MemoryFill
            case 12 =>
              val elem = r.u32(); out += TableInit(elem, r.u32())
            case 13 => out += ElemDrop(r.u32())
            case 14 =>
              val dst = r.u32(); out += TableCopy(dst, r.u32())
            case 15 => out += TableGrow(r.u32())
            case 16 => out += TableSize(r.u32())
            case 17 => out += TableFill(r.u32())
            case sub => throw new WasmDecodeError(s"unsupported 0xFC subopcode $sub")
          }
        case num if num >= 0x45 && num <= 0xC4 => out += Num(num)
        case 0xFD => // simd128 tier (executed by WasmInterp.evalSimd)
          r.u32() match {
            case mem if mem >= 0 && mem <= 11 =>
              out += SimdMem(mem, r.u32(), r.u32())
            case 12 => out += SimdConst(r.bytes(16).toVector)
            case 13 =>
              // lane immediates validate at DECODE time (spec: i8x16
              // .shuffle lanes < 32) so a malformed module raises the
              // named WasmDecodeError instead of an executor-side
              // ArrayIndexOutOfBounds deep in evalSimd
              out += SimdShuffle(Vector.fill(16) {
                val l = r.u8() & 0xFF
                if (l >= 32) throw new WasmDecodeError(
                  s"i8x16.shuffle lane index $l out of range (< 32)")
                l
              })
            case ln if ln >= 21 && ln <= 34 =>
              val lane = r.u8() & 0xFF
              val cap = simdLaneCap(ln)
              if (lane >= cap) throw new WasmDecodeError(
                s"simd128 subopcode $ln lane index $lane out of range (< $cap)")
              out += SimdLane(ln, lane)
            case ml if ml >= 84 && ml <= 91 =>
              val a = r.u32(); val o = r.u32()
              val lane = r.u8() & 0xFF
              val cap = simdLaneCap(ml)
              if (lane >= cap) throw new WasmDecodeError(
                s"simd128 subopcode $ml lane index $lane out of range (< $cap)")
              out += SimdMemLane(ml, a, o, lane)
            case mz if mz == 92 || mz == 93 =>
              out += SimdMem(mz, r.u32(), r.u32())
            case plain if plain <= 255 => out += SimdOp(plain)
            // relaxed-simd (0x100–0x113): DECODES since r14 — executed
            // under the deterministic profile (each op behaves as its
            // strict sibling; see WasmInterp's relaxed block)
            case rel if rel >= 0x100 && rel <= 0x113 => out += SimdOp(rel)
            case other => throw new WasmDecodeError(
              s"unassigned simd128 subopcode $other")
          }
        case 0xFE => // threads tier: atomics, single-agent execution
          r.u32() match {
            case 3 =>
              val flag = r.u8()
              if (flag != 0) throw new WasmDecodeError(
                s"atomic.fence: bad flag $flag")
              out += AtomicFence
            case sub if sub <= 2 || (sub >= 0x10 && sub <= 0x4E) =>
              val a = r.u32()
              out += AtomicOp(sub, a, r.u32())
            case sub => throw new WasmDecodeError(
              f"unassigned atomic subopcode 0x$sub%02X")
          }
        case 0xD0 =>
          // heap type is an s33 (a concrete index needs multi-byte LEB);
          // normalized to the engine's kind-level byte at decode
          out += RefNull(heapKindByte(r, r.s64(), "ref.null") & 0xFF)
        case 0xD1 => out += RefIsNull
        case 0xD2 => out += RefFunc(r.u32())
        case 0xD3 => out += RefEq
        case 0xD4 => out += RefAsNonNull
        case 0xD5 => out += BrOnNull(r.u32())
        case 0xD6 => out += BrOnNonNull(r.u32())
        case 0xFB => // wasm-gc tier (r16): scalar-shaped subset executes
          r.u32() match {
            case 0 => out += StructNew(r.u32())
            case 1 => out += StructNewDefault(r.u32())
            case g if g >= 2 && g <= 4 =>
              val t = r.u32()
              out += StructGet(t, r.u32(), g - 2)
            case 5 =>
              val t = r.u32()
              out += StructSet(t, r.u32())
            case 6 => out += ArrayNew(r.u32())
            case 7 => out += ArrayNewDefault(r.u32())
            case 8 =>
              val t = r.u32()
              val n = r.u32()
              if (n < 0 || n > (1 << 16)) throw new WasmDecodeError(
                s"array.new_fixed size $n exceeds this engine's 2^16 cap")
              out += ArrayNewFixed(t, n)
            case 9 =>
              val t = r.u32()
              out += ArrayNewData(t, r.u32())
            case 10 =>
              val t = r.u32()
              out += ArrayNewElem(t, r.u32())
            case g if g >= 11 && g <= 13 => out += ArrayGet(r.u32(), g - 11)
            case 14 => out += ArraySet(r.u32())
            case 15 => out += ArrayLen
            case 16 => out += ArrayFill(r.u32())
            case 17 =>
              val d = r.u32()
              out += ArrayCopy(d, r.u32())
            case 18 =>
              val t = r.u32()
              out += ArrayInitData(t, r.u32())
            case 19 =>
              val t = r.u32()
              out += ArrayInitElem(t, r.u32())
            case c if c >= 20 && c <= 23 =>
              val what = if (c <= 21) "ref.test" else "ref.cast"
              val ht = heapTypeExact(r, what)
              out += (if (c <= 21) RefTest(ht, c == 21)
                      else RefCast(ht, c == 23))
            case c if c == 24 || c == 25 =>
              val flags = r.u8() & 0xFF
              if (flags > 3) throw new WasmDecodeError(
                s"br_on_cast: bad flags byte $flags")
              val d = r.u32()
              val src = heapTypeExact(r, "br_on_cast source")
              val dst = heapTypeExact(r, "br_on_cast target")
              out += BrOnCast(d, src, (flags & 1) != 0,
                dst, (flags & 2) != 0, onFail = c == 25)
            case 26 => out += AnyConvertExtern
            case 27 => out += ExternConvertAny
            case 28 => out += RefI31
            case 29 => out += I31Get(signed = true)
            case 30 => out += I31Get(signed = false)
            case sub => throw new WasmDecodeError(
              s"unassigned wasm-gc subopcode $sub")
          }
        case 0x25 => out += TableGet(r.u32())
        case 0x26 => out += TableSet(r.u32())
        case other => throw new WasmDecodeError(
          f"unsupported opcode 0x$other%02X at offset ${r.pos - 1}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---------- encoding ----------

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u32(v0: Int): Unit = {
      var v = v0.toLong & 0xFFFFFFFFL
      var more = true
      while (more) {
        val byte = (v & 0x7F).toInt
        v >>>= 7
        more = v != 0
        u8(if (more) byte | 0x80 else byte)
      }
    }
    def s64(v0: Long): Unit = {
      var v = v0
      var more = true
      while (more) {
        val byte = (v & 0x7F).toInt
        v >>= 7
        more = !((v == 0 && (byte & 0x40) == 0) || (v == -1 && (byte & 0x40) != 0))
        u8(if (more) byte | 0x80 else byte)
      }
    }
    def s32(v: Int): Unit = s64(v.toLong)
    def raw(b: Array[Byte]): Unit = out.write(b)
    def name(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u32(b.length); raw(b)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  def encode(m: WasmModule): Array[Byte] = {
    val w = new Writer
    w.raw(Magic); w.raw(Version)

    def section(id: Int)(f: Writer => Unit): Unit = {
      val sw = new Writer
      f(sw)
      val body = sw.bytes
      w.u8(id); w.u32(body.length); w.raw(body)
    }

    if (m.types.nonEmpty) section(1) { s =>
      s.u32(m.types.size)
      def field(f: FieldType): Unit = {
        s.u8(f.storage & 0xFF); s.u8(if (f.mutable) 1 else 0)
      }
      (0 until m.types.size).foreach { i =>
        val sup = m.superOf(i)
        if (sup >= 0) { s.u8(0x50); s.u32(1); s.u32(sup) }
        m.comp(i) match {
          case CFunc(t) =>
            s.u8(0x60)
            s.u32(t.params.size); t.params.foreach(p => s.u8(p & 0xFF))
            s.u32(t.results.size); t.results.foreach(p => s.u8(p & 0xFF))
          case CStruct(fs) =>
            s.u8(0x5F); s.u32(fs.size); fs.foreach(field)
          case CArray(e) =>
            s.u8(0x5E); field(e)
        }
      }
    }
    if (m.imports.nonEmpty) section(2) { s =>
      s.u32(m.imports.size)
      m.imports.foreach { i =>
        s.name(i.module); s.name(i.name); s.u8(0x00); s.u32(i.typeIdx)
      }
    }
    if (m.funcTypeIdxs.nonEmpty) section(3) { s =>
      s.u32(m.funcTypeIdxs.size); m.funcTypeIdxs.foreach(s.u32)
    }
    if (m.tables.nonEmpty) section(4) { s =>
      s.u32(m.tables.size)
      m.tables.foreach { t =>
        s.u8(t.elemType & 0xFF)
        t.max match {
          case Some(mx) => s.u8(0x01); s.u32(t.min); s.u32(mx)
          case None => s.u8(0x00); s.u32(t.min)
        }
      }
    }
    if (m.memMinPages > 0 || m.memMaxPages.nonEmpty) section(5) { s =>
      s.u32(1)
      val f64 = if (m.mem64) 4 else 0 // memory64 flag bit
      m.memMaxPages match {
        case Some(max) => s.u8(0x01 | f64); s.u32(m.memMinPages); s.u32(max)
        case None      => s.u8(0x00 | f64); s.u32(m.memMinPages)
      }
    }
    if (m.tags.nonEmpty) section(13) { s =>
      s.u32(m.tags.size)
      m.tags.foreach { t => s.u8(0x00); s.u32(t.typeIdx) }
    }
    if (m.globals.nonEmpty) section(6) { s =>
      s.u32(m.globals.size)
      m.globals.foreach { g =>
        s.u8(g.valType & 0xFF); s.u8(if (g.mutable) 1 else 0)
        encodeSeq(s, g.init); s.u8(0x0B)
      }
    }
    if (m.exports.nonEmpty) section(7) { s =>
      s.u32(m.exports.size)
      m.exports.foreach { e => s.name(e.name); s.u8(e.kind); s.u32(e.idx) }
    }
    m.start.foreach(idx => section(8)(_.u32(idx)))
    if (m.elems.nonEmpty) section(9) { s =>
      s.u32(m.elems.size)
      m.elems.foreach { e =>
        // expr form needed for ref.null items or externref segments
        val exprForm = e.elemType != 0x70 || e.funcIdxs.contains(-1)
        val flag = e.mode match {
          case 0 =>
            if (!exprForm && e.tableIdx == 0) 0
            else if (!exprForm) 2
            else if (e.tableIdx == 0) 4
            else 6
          case 1 => if (exprForm) 5 else 1
          case _ => if (exprForm) 7 else 3
        }
        s.u32(flag)
        if (flag == 2 || flag == 6) s.u32(e.tableIdx)
        if (e.mode == 0) { s.u8(0x41); s.s32(e.offset); s.u8(0x0B) }
        if (flag >= 4) {
          if (flag != 4) s.u8(e.elemType & 0xFF)
          s.u32(e.funcIdxs.size)
          e.funcIdxs.foreach { k =>
            if (k < 0) { s.u8(0xD0); s.u8(e.elemType & 0xFF) }
            else { s.u8(0xD2); s.u32(k) }
            s.u8(0x0B)
          }
        } else {
          if (flag != 0) s.u8(0x00) // elemkind
          s.u32(e.funcIdxs.size); e.funcIdxs.foreach(s.u32)
        }
      }
    }
    // DataCount (id 12) must precede code when memory.init/data.drop
    // reference passive segments (spec §5.5.16 — validators need the
    // count before bodies).
    if (m.datas.exists(_.passive)) section(12)(_.u32(m.datas.size))
    if (m.codes.nonEmpty) section(10) { s =>
      s.u32(m.codes.size)
      m.codes.foreach { c =>
        val cw = new Writer
        // run-length group the locals as the format requires
        val groups = c.locals.foldLeft(Vector.empty[(Byte, Int)]) { (acc, vt) =>
          acc.lastOption match {
            case Some((t, n)) if t == vt => acc.init :+ ((t, n + 1))
            case _ => acc :+ ((vt, 1))
          }
        }
        cw.u32(groups.size)
        groups.foreach { case (t, n) => cw.u32(n); cw.u8(t & 0xFF) }
        encodeSeq(cw, c.body); cw.u8(0x0B)
        val body = cw.bytes
        s.u32(body.length); s.raw(body)
      }
    }
    if (m.datas.nonEmpty) section(11) { s =>
      s.u32(m.datas.size)
      m.datas.foreach { d =>
        if (d.passive) s.u32(1)
        else {
          s.u32(0)
          // memory64 offsets are i64 consts
          if (m.mem64) { s.u8(0x42); s.s64(d.offset.toLong) }
          else { s.u8(0x41); s.s32(d.offset) }
          s.u8(0x0B)
        }
        s.u32(d.bytes.size); s.raw(d.bytes.toArray)
      }
    }
    w.bytes
  }

  /** blocktype is an s33: the single-byte forms (0x40 empty, valtype
   *  bytes) ARE their own s33 encodings; a func-type index (stored as
   *  `-1 - idx`) encodes as a non-negative signed LEB. */
  private def blocktype(w: Writer, bt: Int): Unit =
    if (bt >= 0) w.u8(bt) else w.s64((-1L - bt))

  /** Encode an exact heap type (the [[heapTypeExact]] representation):
   *  concrete index as a positive s33, abstract as its single byte
   *  (which, bit 6 set, reads back as the negative s33). */
  private def encodeHeapT(w: Writer, ht: Int): Unit =
    if (ht >= 0) w.s64(ht.toLong) else w.u8((~ht) & 0xFF)

  private def encodeSeq(w: Writer, body: Vector[Instr]): Unit =
    body.foreach {
      case Unreachable => w.u8(0x00)
      case Nop => w.u8(0x01)
      case Block(bt, b) => w.u8(0x02); blocktype(w, bt); encodeSeq(w, b); w.u8(0x0B)
      case Loop(bt, b) => w.u8(0x03); blocktype(w, bt); encodeSeq(w, b); w.u8(0x0B)
      case If(bt, t, e) =>
        w.u8(0x04); blocktype(w, bt); encodeSeq(w, t)
        if (e.nonEmpty) { w.u8(0x05); encodeSeq(w, e) }
        w.u8(0x0B)
      case Throw(t) => w.u8(0x08); w.u32(t)
      case ThrowRef => w.u8(0x0A)
      case TryTable(bt, catches, b) =>
        w.u8(0x1F); blocktype(w, bt)
        w.u32(catches.size)
        catches.foreach {
          case CatchTag(t, l) => w.u8(0x00); w.u32(t); w.u32(l)
          case CatchTagRef(t, l) => w.u8(0x01); w.u32(t); w.u32(l)
          case CatchAll(l) => w.u8(0x02); w.u32(l)
          case CatchAllRef(l) => w.u8(0x03); w.u32(l)
        }
        encodeSeq(w, b); w.u8(0x0B)
      case Br(d) => w.u8(0x0C); w.u32(d)
      case BrIf(d) => w.u8(0x0D); w.u32(d)
      case BrTable(ts, d) =>
        w.u8(0x0E); w.u32(ts.size); ts.foreach(w.u32); w.u32(d)
      case Return => w.u8(0x0F)
      case Call(f) => w.u8(0x10); w.u32(f)
      case CallIndirect(t, tbl) => w.u8(0x11); w.u32(t); w.u32(tbl)
      case ReturnCall(f) => w.u8(0x12); w.u32(f)
      case ReturnCallIndirect(t, tbl) => w.u8(0x13); w.u32(t); w.u32(tbl)
      case CallRef(t) => w.u8(0x14); w.u32(t)
      case ReturnCallRef(t) => w.u8(0x15); w.u32(t)
      case RefAsNonNull => w.u8(0xD4)
      case BrOnNull(d) => w.u8(0xD5); w.u32(d)
      case BrOnNonNull(d) => w.u8(0xD6); w.u32(d)
      case Drop => w.u8(0x1A)
      case Select => w.u8(0x1B)
      case SelectT(ts) =>
        w.u8(0x1C); w.u32(ts.size); ts.foreach(t => w.u8(t & 0xFF))
      case RefNull(ht) => w.u8(0xD0); w.u8(ht)
      case RefIsNull => w.u8(0xD1)
      case RefFunc(f) => w.u8(0xD2); w.u32(f)
      case RefEq => w.u8(0xD3)
      case StructNew(t) => w.u8(0xFB); w.u32(0); w.u32(t)
      case StructNewDefault(t) => w.u8(0xFB); w.u32(1); w.u32(t)
      case StructGet(t, f, sg) => w.u8(0xFB); w.u32(2 + sg); w.u32(t); w.u32(f)
      case StructSet(t, f) => w.u8(0xFB); w.u32(5); w.u32(t); w.u32(f)
      case ArrayNew(t) => w.u8(0xFB); w.u32(6); w.u32(t)
      case ArrayNewDefault(t) => w.u8(0xFB); w.u32(7); w.u32(t)
      case ArrayNewFixed(t, n) => w.u8(0xFB); w.u32(8); w.u32(t); w.u32(n)
      case ArrayGet(t, sg) => w.u8(0xFB); w.u32(11 + sg); w.u32(t)
      case ArraySet(t) => w.u8(0xFB); w.u32(14); w.u32(t)
      case ArrayLen => w.u8(0xFB); w.u32(15)
      case ArrayFill(t) => w.u8(0xFB); w.u32(16); w.u32(t)
      case ArrayCopy(d, s) => w.u8(0xFB); w.u32(17); w.u32(d); w.u32(s)
      case RefI31 => w.u8(0xFB); w.u32(28)
      case I31Get(sg) => w.u8(0xFB); w.u32(if (sg) 29 else 30)
      case ArrayNewData(t, d) => w.u8(0xFB); w.u32(9); w.u32(t); w.u32(d)
      case ArrayNewElem(t, e) => w.u8(0xFB); w.u32(10); w.u32(t); w.u32(e)
      case ArrayInitData(t, d) => w.u8(0xFB); w.u32(18); w.u32(t); w.u32(d)
      case ArrayInitElem(t, e) => w.u8(0xFB); w.u32(19); w.u32(t); w.u32(e)
      case RefTest(ht, nl) =>
        w.u8(0xFB); w.u32(if (nl) 21 else 20); encodeHeapT(w, ht)
      case RefCast(ht, nl) =>
        w.u8(0xFB); w.u32(if (nl) 23 else 22); encodeHeapT(w, ht)
      case BrOnCast(d, src, sn, dst, dn, onFail) =>
        w.u8(0xFB); w.u32(if (onFail) 25 else 24)
        w.u8((if (sn) 1 else 0) | (if (dn) 2 else 0))
        w.u32(d); encodeHeapT(w, src); encodeHeapT(w, dst)
      case AnyConvertExtern => w.u8(0xFB); w.u32(26)
      case ExternConvertAny => w.u8(0xFB); w.u32(27)
      case TableGet(t) => w.u8(0x25); w.u32(t)
      case TableSet(t) => w.u8(0x26); w.u32(t)
      case TableInit(e, t) => w.u8(0xFC); w.u32(12); w.u32(e); w.u32(t)
      case ElemDrop(e) => w.u8(0xFC); w.u32(13); w.u32(e)
      case TableCopy(d, s) => w.u8(0xFC); w.u32(14); w.u32(d); w.u32(s)
      case TableGrow(t) => w.u8(0xFC); w.u32(15); w.u32(t)
      case TableSize(t) => w.u8(0xFC); w.u32(16); w.u32(t)
      case TableFill(t) => w.u8(0xFC); w.u32(17); w.u32(t)
      case AtomicOp(sub, a, o) => w.u8(0xFE); w.u32(sub); w.u32(a); w.u32(o)
      case AtomicFence => w.u8(0xFE); w.u32(3); w.u8(0x00)
      case LocalGet(i) => w.u8(0x20); w.u32(i)
      case LocalSet(i) => w.u8(0x21); w.u32(i)
      case LocalTee(i) => w.u8(0x22); w.u32(i)
      case GlobalGet(i) => w.u8(0x23); w.u32(i)
      case GlobalSet(i) => w.u8(0x24); w.u32(i)
      case MemLoad(op, a, o) => w.u8(op); w.u32(a); w.u32(o)
      case MemStore(op, a, o) => w.u8(op); w.u32(a); w.u32(o)
      case MemorySize => w.u8(0x3F); w.u8(0x00)
      case MemoryGrow => w.u8(0x40); w.u8(0x00)
      case TruncSat(sub) => w.u8(0xFC); w.u32(sub)
      case MemoryInit(seg) => w.u8(0xFC); w.u32(8); w.u32(seg); w.u8(0x00)
      case DataDrop(seg) => w.u8(0xFC); w.u32(9); w.u32(seg)
      case MemoryCopy => w.u8(0xFC); w.u32(10); w.u8(0x00); w.u8(0x00)
      case MemoryFill => w.u8(0xFC); w.u32(11); w.u8(0x00)
      case I32Const(v) => w.u8(0x41); w.s32(v)
      case I64Const(v) => w.u8(0x42); w.s64(v)
      case F32Const(bits) =>
        w.u8(0x43)
        w.u8(bits); w.u8(bits >> 8); w.u8(bits >> 16); w.u8(bits >> 24)
      case F64Const(bits) =>
        w.u8(0x44)
        var i = 0
        while (i < 8) { w.u8((bits >>> (8 * i)).toInt); i += 1 }
      case Num(op) => w.u8(op)
      case SimdOp(sub) => w.u8(0xFD); w.u32(sub)
      case SimdMem(sub, a, o) => w.u8(0xFD); w.u32(sub); w.u32(a); w.u32(o)
      case SimdConst(b) => w.u8(0xFD); w.u32(12); b.foreach(x => w.u8(x & 0xFF))
      case SimdShuffle(lanes) =>
        w.u8(0xFD); w.u32(13); lanes.foreach(w.u8)
      case SimdLane(sub, lane) => w.u8(0xFD); w.u32(sub); w.u8(lane)
      case SimdMemLane(sub, a, o, lane) =>
        w.u8(0xFD); w.u32(sub); w.u32(a); w.u32(o); w.u8(lane)
    }
}
