package graft.wasm

/**
 * WebAssembly MVP evaluator over the [[WasmModule]] AST.
 *
 * Execution model (WebAssembly spec §4): a structured-control stack
 * machine. Values live on one operand stack as raw 64-bit slots (i32
 * sign-extended in the low word, f32/f64 as IEEE bits); blocks record
 * the operand-stack height on entry so a `br` unwinds to the target's
 * arity exactly as the spec's label semantics require. Traps (OOB
 * access, div-by-zero, unreachable) surface as [[WasmTrap]].
 *
 * Host imports are Scala closures and may RE-ENTER the instance — the
 * lens ABI depends on this: the host's `next()` import allocates guest
 * memory via the guest's own exported `alloc` while `transform` is on
 * the interpreter stack (reference:
 * host-go/runtimes/wasmtime/runtime.go:87-91,192-205). Re-entrancy is
 * free here because each invocation owns its locals/operands; only
 * memory and globals are instance state.
 *
 * Deliberately an interpreter, not a compiler: lens guests are a few
 * hundred instructions per item and the per-partition loop amortizes
 * instantiation. Scale note for 100 TB: instances are per-partition and
 * share nothing; memory is bounded by the guest's own allocator
 * discipline (see LensGuestModules).
 */
object WasmInterp {

  // wasm-gc ref encoding in the 64-bit slot model (r16): heap refs are
  // GcTag | arena index, i31 refs are I31Tag | 31-bit payload (unboxed),
  // null stays -1. The tags sit far above any function index or table
  // size, so a cross-kind confusion is caught by the named guards.
  private final val GcTag = 0x2000000000000000L
  private final val I31Tag = 0x4000000000000000L
  /** EH tier (late r16): exnref slot encoding — arena index under its
   *  own tag, disjoint from GcTag/I31Tag. */
  private final val ExnTag = 0x1000000000000000L
  private final val GcHeapCap = 1 << 22
  private final val GcArrayCap = 1 << 24
  private sealed trait GcObj
  private final class GcStruct(val typeIdx: Int,
      val fields: Array[Long]) extends GcObj
  private final class GcArray(val typeIdx: Int,
      val elems: Array[Long]) extends GcObj
  /** One thrown exception package (tag + payload). */
  private final class ExnPackage(val tagIdx: Int, val args: Vector[Long])
  /** Unwind carrier for `throw` — NOT a trap: try_table catches it and
   *  only an uncaught escape becomes a named trap at the outermost
   *  invocation. Stack trace suppressed: throwing is control flow. */
  private final class WasmExn(val pkg: ExnPackage)
      extends RuntimeException(null, null, false, false)

  /** Pages are 64 KiB (WebAssembly spec §4.2.8). */
  val PageSize: Int = 65536

  private val moduleCache =
    new java.util.concurrent.ConcurrentHashMap[java.math.BigInteger, WasmModule]()

  /** Decode-once cache keyed by content hash — executors instantiate many
   *  partitions from the same broadcast module bytes. */
  def moduleOf(bytes: Array[Byte]): WasmModule = {
    val key = new java.math.BigInteger(
      java.security.MessageDigest.getInstance("MD5").digest(bytes))
    moduleCache.computeIfAbsent(key, _ => WasmBinary.decode(bytes))
  }

  /** One live instance: memory + globals + import bindings. Not
   *  thread-safe (mirrors the reference's single-threaded store). */
  final class Instance(
      val module: WasmModule,
      imports: Map[(String, String), Vector[Long] => Vector[Long]],
      stepBudget: Long = 1L << 26) {

    // Validate BEFORE any allocation or execution (spec §3; the
    // reference's embedded runtimes validate at instantiation —
    // host-go/runtimes/wasmtime/runtime.go:164-227): a type-broken
    // module fails here by name, and the evaluator below may assume
    // type discipline holds.
    WasmValidate.validate(module)

    private[wasm] var memory: Array[Byte] =
      new Array[Byte](module.memMinPages * PageSize)

    // Execution fuel (r14): loop back-edges + function calls decrement
    // a per-outermost-invocation budget, so a corrupt or hostile
    // module's infinite loop surfaces as a NAMED WasmTrap instead of a
    // hung executor task — the execution-side face of the codec fuzz
    // contract. The default (2^26 back-edges/calls) is ~5 orders of
    // magnitude above what any lens guest spends per item; counting
    // only back-edges and calls keeps the straight-line hot path free
    // of the check. Re-entrant host imports (the lens `next` ABI) share
    // the outermost budget — depth tracking prevents a reset mid-run.
    private var fuelLeft: Long = stepBudget
    private var activeDepth: Int = 0
    @inline private def burn(): Unit = {
      fuelLeft -= 1
      if (fuelLeft < 0) throw new WasmTrap(
        s"step budget exhausted ($stepBudget loop back-edges/calls) — " +
          "runaway guest loop")
    }

    private val globals: Array[Long] = module.globals.map { g =>
      g.init match {
        case Vector(I32Const(v)) => v.toLong
        case Vector(I64Const(v)) => v
        case Vector(F32Const(b)) => b.toLong & 0xFFFFFFFFL
        case Vector(F64Const(b)) => b
        case Vector(RefNull(_)) => -1L // reference-types null
        case Vector(RefFunc(k)) => k.toLong
        case other => throw new WasmTrap(s"unsupported global init $other")
      }
    }.toArray

    private val importedFns: Vector[Vector[Long] => Vector[Long]] =
      module.imports.map { imp =>
        imports.getOrElse((imp.module, imp.name), throw new WasmTrap(
          s"missing import ${imp.module}.${imp.name}"))
      }

    // data segments: active ones copy in at instantiation; passive ones
    // sit inert until memory.init / data.drop (a dropped segment behaves
    // as empty thereafter, spec §4.5.9).
    private val droppedData = new Array[Boolean](module.datas.size)
    module.datas.zipWithIndex.foreach { case (d, di) =>
      if (!d.passive) {
        val arr = d.bytes.toArray
        if (d.offset < 0 || d.offset + arr.length > memory.length)
          throw new WasmTrap("data segment out of bounds")
        System.arraycopy(arr, 0, memory, d.offset, arr.length)
        droppedData(di) = true // active segments drop after instantiation
      }
    }

    // Tables (reference-types: any count, funcref/externref) hold ref
    // values as Longs: -1 = null, else a function index / opaque
    // extern value. A module with elem segments but no table section
    // (tolerated pre-r14) synthesizes one funcref table; active
    // segments size their table up, mirroring the MVP leniency.
    private val tables: scala.collection.mutable.ArrayBuffer[Array[Long]] = {
      val declared =
        if (module.tables.nonEmpty) module.tables
        else if (module.elems.nonEmpty)
          Vector(TableType(ValType.Funcref, 0, None))
        else Vector.empty[TableType]
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      declared.zipWithIndex.foreach { case (tt, ti) =>
        // Long arithmetic + a named cap: offsets/sizes are attacker
        // bytes, and `offset + size` must neither overflow Int nor
        // size an executor-killing allocation (decode already caps
        // declared mins; the segment-stretched extent needs the same)
        val extent = (tt.min.toLong +: module.elems.collect {
          case e if e.mode == 0 && e.tableIdx == ti =>
            e.offset.toLong + e.funcIdxs.size
        }).max
        if (extent < 0 || extent > (1L << 22)) throw new WasmTrap(
          s"table $ti extent $extent exceeds this engine's 2^22-slot cap")
        buf += Array.fill(extent.toInt)(-1L)
      }
      buf
    }
    // element segments: active ones copy in and drop at instantiation;
    // declarative ones drop immediately (their items exist only for
    // ref.func validation); passive ones wait for table.init/elem.drop
    private val droppedElems = new Array[Boolean](module.elems.size)
    module.elems.zipWithIndex.foreach { case (e, ei) =>
      e.mode match {
        case 0 =>
          if (e.tableIdx >= tables.size) throw new WasmTrap(
            s"elem segment targets missing table ${e.tableIdx}")
          val t = tables(e.tableIdx)
          if (e.offset < 0 || e.offset.toLong + e.funcIdxs.size > t.length)
            throw new WasmTrap("elem segment out of bounds")
          var i = 0
          while (i < e.funcIdxs.size) {
            t(e.offset + i) = e.funcIdxs(i).toLong; i += 1
          }
          droppedElems(ei) = true
        case 2 => droppedElems(ei) = true
        case _ => ()
      }
    }

    @inline private def tableAt(ti: Int): Array[Long] = {
      if (ti < 0 || ti >= tables.size)
        throw new WasmTrap(s"no table $ti")
      tables(ti)
    }

    module.start.foreach(idx => invokeByIndex(idx, Vector.empty))

    def memorySize: Int = memory.length

    def readBytes(offset: Int, len: Int): Array[Byte] = {
      checkBounds(offset.toLong, len.toLong)
      java.util.Arrays.copyOfRange(memory, offset, offset + len)
    }

    def writeBytes(offset: Int, bytes: Array[Byte]): Unit = {
      checkBounds(offset.toLong, bytes.length.toLong)
      System.arraycopy(bytes, 0, memory, offset, bytes.length)
    }

    def invoke(name: String, args: Long*): Vector[Long] = {
      val exp = module.export(name).getOrElse(
        throw new WasmTrap(s"export `$name` does not exist"))
      if (exp.kind != 0) throw new WasmTrap(s"export `$name` is not a function")
      invokeByIndex(exp.idx, args.toVector)
    }

    def hasExport(name: String): Boolean =
      module.export(name).exists(_.kind == 0)

    // ---------- evaluation ----------

    private def invokeByIndex(funcIdx: Int, args: Vector[Long]): Vector[Long] = {
      if (activeDepth == 0) {
        fuelLeft = stepBudget
        // gc arena reset per outermost invocation — the per-item
        // discipline that keeps partition memory bounded (see gcHeap)
        if (gcHeap.nonEmpty) gcHeap.clear()
        if (exnHeap.nonEmpty) exnHeap.clear()
      }
      activeDepth += 1
      try invokeByIndex0(funcIdx, args)
      catch {
        // an exception no try_table caught leaves the invocation as a
        // NAMED trap (the embedder-visible outcome the reference's
        // runtimes report for an escaped exception)
        case e: WasmExn if activeDepth == 1 =>
          throw new WasmTrap(
            s"uncaught wasm exception (tag ${e.pkg.tagIdx})")
        // unbounded recursion exhausts the JVM stack before fuel can —
        // convert to the named trap at the OUTERMOST frame, where the
        // stack has already unwound (wasmtime's stack-exhaustion trap).
        // No rename for IndexOutOfBoundsException here: [[WasmValidate]]
        // runs before execution, so an evaluator index error on a
        // validated module is an ENGINE bug and must propagate raw —
        // the execution fuzz's named-outcome contract is how such a
        // regression fails loudly (r14's blanket rename would have
        // masked it as guest malformation).
        case _: StackOverflowError if activeDepth == 1 =>
          throw new WasmTrap("call stack exhausted — runaway guest recursion")
      } finally activeDepth -= 1
    }

    private def invokeByIndex0(funcIdx0: Int, args0: Vector[Long]): Vector[Long] = {
      // TAIL-CALL FRAME LOOP (function-references tier, late r16): a
      // return_call* in the body surfaces as the TAIL signal with the
      // target + args parked in tailTarget/tailArgs, and this loop
      // re-enters the next frame IN PLACE — chained tail calls run in
      // constant JVM stack, as the proposal requires (fuel still burns
      // per hop, so a tail-recursive spin trips the step budget, not
      // the JVM stack). The v128 watermark is the ENTRY frame's: tail
      // hops share one reclamation scope, settled at the final return.
      var funcIdx = funcIdx0
      var args = args0
      val nImports = module.imports.size
      val watermark = v128Pool.size
      var ok = false
      var res: Vector[Long] = null
      var ftype: FuncType = null
      try {
        var running = true
        while (running) {
          burn()
          if (funcIdx < nImports) {
            val out = importedFns(funcIdx)(args)
            ok = true
            return out
          }
          val localIdx = funcIdx - nImports
          ftype = module.types(module.funcTypeIdxs(localIdx))
          val body = module.codes(localIdx)
          val locals = new Array[Long](ftype.params.size + body.locals.size)
          var i = 0
          while (i < args.size) { locals(i) = args(i); i += 1 }
          // reference-typed locals default to NULL (-1), not 0 — a zero
          // default would alias function index 0 / a live extern value
          var li = 0
          while (li < body.locals.size) {
            if (ValType.isRef(body.locals(li)))
              locals(ftype.params.size + li) = -1L
            li += 1
          }
          val stack = new OperandStack
          // v128 pool discipline: handles cannot escape a call except
          // through its RESULTS (locals die with the frame, memory
          // holds bytes not handles, v128 globals are rejected at
          // instantiation), so each call truncates the pool back to
          // its entry watermark and compacts any v128 results down to
          // it — a SIMD hot loop's allocations are reclaimed per call,
          // not per entry invocation.
          evalSeq(body.body, locals, stack) match {
            case TAIL =>
              funcIdx = tailTarget
              args = tailArgs
              tailArgs = null
            case _ =>
              // Fall, Branch(spent) or Ret leave results on the stack
              res = Vector.fill(ftype.results.size)(stack.pop()).reverse
              running = false
          }
        }
        val out =
          if (v128Pool.size > watermark) {
            // compact v128 results into the watermark region, in order.
            // Snapshot the result arrays FIRST: with multiple v128
            // results a later result's handle can fall inside the
            // already-compacted prefix (e.g. res = [watermark+5,
            // watermark]) and an in-place copy would clobber it before
            // it is read.
            val snap = res.zip(ftype.results).map {
              case (h, t) if t == ValType.V128 && h >= watermark =>
                v128Pool(h.toInt)
              case _ => null
            }
            var next = watermark
            val compacted = res.zip(ftype.results).zipWithIndex.map {
              case ((h, t), i) if t == ValType.V128 && h >= watermark =>
                v128Pool(next) = snap(i)
                val nh = next.toLong
                next += 1
                nh
              case ((h, _), _) => h
            }
            v128Pool.remove(next, v128Pool.size - next)
            compacted
          } else res
        ok = true
        out
      } finally {
        // a trap unwinds the whole invocation chain: nothing escapes
        if (!ok && v128Pool.size > watermark)
          v128Pool.remove(watermark, v128Pool.size - watermark)
      }
    }

    /** v128 values live in this side pool; a stack/local slot holds the
     *  pool index. Slot 0 stays the zero vector (the default value of
     *  uninitialized v128 locals). Reclamation: [[invokeByIndex]]. */
    private val v128Pool =
      scala.collection.mutable.ArrayBuffer[Array[Byte]](new Array[Byte](16))

    /** wasm-gc tier (r16): struct/array objects live in this ARENA,
     *  reclaimed wholesale at each OUTERMOST invocation entry. Nothing
     *  can legally survive one: GC-heap-ref globals are rejected at
     *  validation, the host cannot dereference a returned ref, and
     *  tables hold funcref/externref only — so the per-item reset that
     *  keeps guest linear memory bounded bounds the gc heap the same
     *  way. Heap refs encode as `GcTag | index`; i31 refs are UNBOXED
     *  (`I31Tag | payload`, no heap object); null = -1. */
    private val gcHeap = scala.collection.mutable.ArrayBuffer.empty[GcObj]
    private def gcAlloc(o: GcObj): Long = {
      if (gcHeap.size >= GcHeapCap) throw new WasmTrap(
        s"gc allocation cap ($GcHeapCap live objects) exceeded")
      gcHeap += o
      GcTag | (gcHeap.size - 1).toLong
    }
    /** EH tier: caught-exception packages referenced by exnref slots;
     *  reclaimed with the gc arena at each outermost invocation. */
    private val exnHeap =
      scala.collection.mutable.ArrayBuffer.empty[ExnPackage]
    private def exnAlloc(p: ExnPackage): Long = {
      if (exnHeap.size >= GcHeapCap) throw new WasmTrap(
        s"exception arena cap ($GcHeapCap live packages) exceeded")
      exnHeap += p
      ExnTag | (exnHeap.size - 1).toLong
    }
    private def exnAt(ref: Long, what: String): ExnPackage = {
      if ((ref & ExnTag) == 0L || (ref & (GcTag | I31Tag)) != 0L)
        throw new WasmTrap(s"$what: operand is not an exception reference")
      val i = (ref ^ ExnTag).toInt
      if (i < 0 || i >= exnHeap.size) throw new WasmTrap(
        s"$what: stale exception reference")
      exnHeap(i)
    }
    private def gcAt(ref: Long, what: String): GcObj = {
      if (ref == -1L) throw new WasmTrap(s"$what: null reference")
      if ((ref & GcTag) == 0L || (ref & I31Tag) != 0L) throw new WasmTrap(
        s"$what: operand is not a gc heap reference")
      val i = (ref ^ GcTag).toInt
      if (i < 0 || i >= gcHeap.size) throw new WasmTrap(
        s"$what: stale gc reference")
      gcHeap(i)
    }
    private def gcStructAt(ref: Long, what: String): GcStruct =
      gcAt(ref, what) match {
        case s: GcStruct => s
        case _ => throw new WasmTrap(s"$what: reference is not a struct")
      }
    private def gcArrayAt(ref: Long, what: String): GcArray =
      gcAt(ref, what) match {
        case a: GcArray => a
        case _ => throw new WasmTrap(s"$what: reference is not an array")
      }
    private def structFields(t: Int): Vector[FieldType] =
      module.comp(t) match {
        case CStruct(fs) => fs
        case _ => throw new WasmTrap(s"type $t is not a struct")
      }
    private def arrayElem(t: Int): FieldType = module.comp(t) match {
      case CArray(e) => e
      case _ => throw new WasmTrap(s"type $t is not an array")
    }
    /** packed fields store masked (zero-extended in the slot)... */
    private def packStore(storage: Byte, v: Long): Long = storage match {
      case ValType.PackedI8 => v & 0xFFL
      case ValType.PackedI16 => v & 0xFFFFL
      case _ => v
    }
    /** ...so `_u` reads return the raw slot and `_s` reads sign-extend
     *  from the packed width (i32 slots are sign-extended Longs). */
    private def fieldLoad(storage: Byte, v: Long, sign: Int): Long =
      if (sign != 1) v
      else if (storage == ValType.PackedI8) (v << 56) >> 56
      else (v << 48) >> 48
    private def checkGcArrayLen(n: Int): Unit =
      if (n < 0 || n > GcArrayCap) throw new WasmTrap(
        s"array allocation length $n exceeds this engine's " +
          s"$GcArrayCap-element cap")

    /** Declared-subtype chain walk: runtime type `rt` matches `target`
     *  iff the `sub` chain from rt reaches it (GC spec runtime casting
     *  semantics — structural similarity is NOT enough). */
    private def chainMatches(rt: Int, target: Int): Boolean = {
      var t = rt
      var guard = module.types.size + 1
      while (t >= 0 && guard > 0) {
        if (t == target) return true
        t = module.superOf(t)
        guard -= 1
      }
      false
    }
    /** Runtime heap-type test shared by ref.test / ref.cast /
     *  br_on_cast. `ht` is the decoder's exact representation: >= 0 a
     *  concrete type index (precise via [[chainMatches]]), < 0
     *  ~abstractByte. Validation already pinned the operand's
     *  hierarchy, so untagged non-null values are func/extern refs. */
    private def refMatches(v: Long, ht: Int, nullable: Boolean): Boolean = {
      def gcIdx: Int = (v ^ GcTag).toInt
      def isHeapRef: Boolean =
        (v & GcTag) != 0L && (v & I31Tag) == 0L &&
          gcIdx >= 0 && gcIdx < gcHeap.size
      if (v == -1L) nullable
      else if (ht >= 0) module.comp(ht) match {
        case _: CFunc =>
          val f = v.toInt
          val nImp = module.imports.size
          v >= 0 && f < nImp + module.funcTypeIdxs.size && chainMatches(
            if (f < nImp) module.imports(f).typeIdx
            else module.funcTypeIdxs(f - nImp), ht)
        case _ =>
          isHeapRef && chainMatches(gcHeap(gcIdx) match {
            case s: GcStruct => s.typeIdx
            case a: GcArray => a.typeIdx
          }, ht)
      } else (~ht).toByte match {
        case ValType.Anyref => true
        case ValType.Eqref => (v & (GcTag | I31Tag)) != 0L
        case ValType.I31ref => (v & I31Tag) != 0L
        case ValType.Structref =>
          isHeapRef && gcHeap(gcIdx).isInstanceOf[GcStruct]
        case ValType.Arrayref =>
          isHeapRef && gcHeap(gcIdx).isInstanceOf[GcArray]
        case ValType.Funcref | ValType.Externref => true
        case _ => false // none / nofunc / noextern: only null inhabits
      }
    }
    private def heapTName(ht: Int): String =
      if (ht >= 0) s"type $ht"
      else (~ht).toByte match {
        case ValType.Anyref => "any"
        case ValType.Eqref => "eq"
        case ValType.I31ref => "i31"
        case ValType.Structref => "struct"
        case ValType.Arrayref => "array"
        case ValType.Funcref => "func"
        case ValType.Externref => "extern"
        case b => f"heap type 0x$b%02X"
      }
    /** Byte width of a numeric/packed array storage type (reference
     *  storages are rejected for data-seeded arrays at validation). */
    private def storageWidth(st: Byte): Int = st match {
      case ValType.PackedI8 => 1
      case ValType.PackedI16 => 2
      case ValType.I32 | ValType.F32 => 4
      case _ => 8
    }
    /** Little-endian read of one array element from data-segment bytes,
     *  slot-encoded per storage type (i32 sign-extends, f32 keeps raw
     *  bits zero-extended, packed widths store raw — the same slot
     *  conventions packStore/fieldLoad use). */
    private def readSegLe(bytes: Vector[Byte], off: Int, st: Byte): Long = {
      val w = storageWidth(st)
      var acc = 0L
      var j = w - 1
      while (j >= 0) { acc = (acc << 8) | (bytes(off + j) & 0xFFL); j -= 1 }
      if (st == ValType.I32) acc.toInt.toLong else acc
    }

    /** Branch signal: -1 = fell through, -2 = function return,
     *  n >= 0 = branch crossing n MORE labels outward. */
    private val FALL = -1
    private val RET = -2
    /** Tail-call signal: like RET, but [[invokeByIndex0]]'s frame loop
     *  re-enters [[tailTarget]] with [[tailArgs]] instead of popping
     *  results — constant-stack return_call* (late r16). */
    private val TAIL = -3
    private var tailTarget: Int = 0
    private var tailArgs: Vector[Long] = null

    /** The declared FuncType of any function index (import or local). */
    private def declaredType(f: Int): FuncType = {
      val nImp = module.imports.size
      module.types(
        if (f < nImp) module.imports(f).typeIdx
        else module.funcTypeIdxs(f - nImp))
    }
    /** call_indirect / return_call_indirect target resolution: slot
     *  bounds, null slot, and the runtime type check. */
    private def indirectTarget(stack: OperandStack, typeIdx: Int,
        tableIdx: Int): Int = {
      val slot = stack.pop().toInt
      val table = tableAt(tableIdx)
      if (slot < 0 || slot >= table.length || table(slot) < 0)
        throw new WasmTrap(s"undefined element at table slot $slot")
      val f = table(slot).toInt
      if (declaredType(f) != module.types(typeIdx))
        throw new WasmTrap("indirect call type mismatch")
      f
    }
    /** Pop + vet a typed function-reference value (call_ref /
     *  return_call_ref): null traps; the value must be a live function
     *  index whose declared type matches the annotation structurally
     *  (call_indirect's rule) or through a declared sub chain. */
    private def popFuncRef(stack: OperandStack, typeIdx: Int,
        what: String): Int = {
      val v = stack.pop()
      if (v == -1L) throw new WasmTrap(s"$what: null function reference")
      val f = v.toInt
      val nImp = module.imports.size
      if (v < 0 || v > Int.MaxValue ||
          f >= nImp + module.funcTypeIdxs.size)
        throw new WasmTrap(s"$what: value is not a function reference")
      val actual = if (f < nImp) module.imports(f).typeIdx
        else module.funcTypeIdxs(f - nImp)
      if (!(module.types(actual) == module.types(typeIdx) ||
          chainMatches(actual, typeIdx)))
        throw new WasmTrap(s"$what: function type mismatch")
      f
    }
    /** Park a tail-call target + its popped args for the frame loop. */
    private def setTail(f: Int, stack: OperandStack): Unit = {
      val argc = declaredType(f).params.size
      val a = new Array[Long](argc)
      var j = argc - 1
      while (j >= 0) { a(j) = stack.pop(); j -= 1 }
      tailTarget = f
      tailArgs = a.toVector
    }

    private def evalSeq(body: Vector[Instr], locals: Array[Long],
        stack: OperandStack): Int = {
      var i = 0
      val n = body.size
      while (i < n) {
        body(i) match {
          case Unreachable => throw new WasmTrap("unreachable executed")
          case Nop =>
          // Branch discipline: only the TARGET label unwinds (keeping its
          // own arity from the top) — an intermediate label crossed by an
          // outward br must leave the stack alone, or it would truncate
          // to ITS arity and drop the values the target keeps (an
          // arity-0 block between a value-carrying br and its arity-1
          // target). The target's truncate-to-entry-height removes any
          // junk intermediate frames left above it.
          case Block(bt, inner) =>
            val h = stack.size - paramArity(bt)
            evalSeq(inner, locals, stack) match {
              case FALL => // values already in place
              case RET => return RET
              case TAIL => return TAIL
              case 0 => unwind(stack, h, resultArity(bt))
              case d => return d - 1
            }
          case Loop(bt, inner) =>
            // A br to a loop label re-enters the loop start carrying the
            // loop's PARAMS (multi-value; zero for MVP blocktypes).
            val p = paramArity(bt)
            val h = stack.size - p
            var looping = true
            while (looping) {
              burn() // fuel: every loop (re-)entry is one step
              evalSeq(inner, locals, stack) match {
                case FALL => looping = false
                case RET => return RET
              case TAIL => return TAIL
                case 0 => unwind(stack, h, p)
                case d => return d - 1
              }
            }
          case If(bt, thn, els) =>
            val cond = stack.pop() != 0L
            val h = stack.size - paramArity(bt)
            evalSeq(if (cond) thn else els, locals, stack) match {
              case FALL =>
              case RET => return RET
              case TAIL => return TAIL
              case 0 => unwind(stack, h, resultArity(bt))
              case d => return d - 1
            }
          case Br(d) => return d
          case BrIf(d) => if (stack.pop() != 0L) return d
          case BrTable(targets, default) =>
            val v = stack.pop().toInt
            return if (v >= 0 && v < targets.size) targets(v) else default
          case Return => return RET
          case Call(f) =>
            val nImp = module.imports.size
            val ftype =
              if (f < nImp) module.types(module.imports(f).typeIdx)
              else module.types(module.funcTypeIdxs(f - nImp))
            val argc = ftype.params.size
            val args = new Array[Long](argc)
            var j = argc - 1
            while (j >= 0) { args(j) = stack.pop(); j -= 1 }
            invokeByIndex(f, args.toVector).foreach(stack.push)
          case CallIndirect(typeIdx, tableIdx) =>
            val f = indirectTarget(stack, typeIdx, tableIdx)
            val ftype = module.types(typeIdx)
            val argc = ftype.params.size
            val args = new Array[Long](argc)
            var j = argc - 1
            while (j >= 0) { args(j) = stack.pop(); j -= 1 }
            invokeByIndex(f, args.toVector).foreach(stack.push)
          case Drop => stack.pop()
          case Select =>
            val c = stack.pop(); val b = stack.pop(); val a = stack.pop()
            stack.push(if (c != 0L) a else b)
          case SelectT(_) => // typed select: same dynamics
            val c = stack.pop(); val b = stack.pop(); val a = stack.pop()
            stack.push(if (c != 0L) a else b)
          case RefNull(_) => stack.push(-1L)
          case RefIsNull => stack.push(if (stack.pop() == -1L) 1L else 0L)
          case RefFunc(f) => stack.push(f.toLong)
          case RefEq =>
            val b = stack.pop(); val a = stack.pop()
            stack.push(if (a == b) 1L else 0L)
          case RefI31 =>
            stack.push(I31Tag | (stack.pop() & 0x7FFFFFFFL))
          case I31Get(signed) =>
            val r0 = stack.pop()
            if (r0 == -1L) throw new WasmTrap("i31.get: null reference")
            if ((r0 & I31Tag) == 0L)
              throw new WasmTrap("i31.get: operand is not an i31")
            val p = r0 & 0x7FFFFFFFL
            stack.push(if (signed) (p << 33) >> 33 else p)
          case StructNew(t) =>
            val fs = structFields(t)
            val vals = new Array[Long](fs.size)
            var j = fs.size - 1
            while (j >= 0) {
              vals(j) = packStore(fs(j).storage, stack.pop()); j -= 1
            }
            stack.push(gcAlloc(new GcStruct(t, vals)))
          case StructNewDefault(t) =>
            val fs = structFields(t)
            val vals = Array.tabulate(fs.size)(j =>
              if (ValType.isRef(fs(j).storage)) -1L else 0L)
            stack.push(gcAlloc(new GcStruct(t, vals)))
          case StructGet(t, f, sign) =>
            val fs = structFields(t)
            val obj = gcStructAt(stack.pop(), "struct.get")
            if (f >= obj.fields.length) throw new WasmTrap(
              s"struct.get: field $f of ${obj.fields.length}")
            stack.push(fieldLoad(fs(f).storage, obj.fields(f), sign))
          case StructSet(t, f) =>
            val fs = structFields(t)
            val v = stack.pop()
            val obj = gcStructAt(stack.pop(), "struct.set")
            if (f >= obj.fields.length) throw new WasmTrap(
              s"struct.set: field $f of ${obj.fields.length}")
            obj.fields(f) = packStore(fs(f).storage, v)
          case ArrayNew(t) =>
            val e = arrayElem(t)
            val n = stack.pop().toInt
            val v = packStore(e.storage, stack.pop())
            checkGcArrayLen(n)
            burn()
            val arr = new Array[Long](n)
            if (v != 0L) java.util.Arrays.fill(arr, v)
            stack.push(gcAlloc(new GcArray(t, arr)))
          case ArrayNewDefault(t) =>
            val e = arrayElem(t)
            val n = stack.pop().toInt
            checkGcArrayLen(n)
            burn()
            val arr = new Array[Long](n)
            if (ValType.isRef(e.storage)) java.util.Arrays.fill(arr, -1L)
            stack.push(gcAlloc(new GcArray(t, arr)))
          case ArrayNewFixed(t, n) =>
            val e = arrayElem(t)
            val arr = new Array[Long](n)
            var j = n - 1
            while (j >= 0) { arr(j) = packStore(e.storage, stack.pop()); j -= 1 }
            stack.push(gcAlloc(new GcArray(t, arr)))
          case ArrayGet(t, sign) =>
            val e = arrayElem(t)
            val i0 = stack.pop().toInt
            val a = gcArrayAt(stack.pop(), "array.get")
            if (i0 < 0 || i0 >= a.elems.length) throw new WasmTrap(
              s"array.get: index $i0 of ${a.elems.length}")
            stack.push(fieldLoad(e.storage, a.elems(i0), sign))
          case ArraySet(t) =>
            val e = arrayElem(t)
            val v = stack.pop()
            val i0 = stack.pop().toInt
            val a = gcArrayAt(stack.pop(), "array.set")
            if (i0 < 0 || i0 >= a.elems.length) throw new WasmTrap(
              s"array.set: index $i0 of ${a.elems.length}")
            a.elems(i0) = packStore(e.storage, v)
          case ArrayLen =>
            stack.push(gcArrayAt(stack.pop(), "array.len").elems.length.toLong)
          case ArrayFill(t) =>
            val e = arrayElem(t)
            val n = stack.pop().toInt
            val v = packStore(e.storage, stack.pop())
            val i0 = stack.pop().toInt
            val a = gcArrayAt(stack.pop(), "array.fill")
            if (n < 0 || i0 < 0 || i0.toLong + n > a.elems.length)
              throw new WasmTrap(s"array.fill: $i0+$n of ${a.elems.length}")
            burn()
            java.util.Arrays.fill(a.elems, i0, i0 + n, v)
          case ArrayCopy(_, _) =>
            // stack: [dst, dstoff, src, srcoff, n]
            val n = stack.pop().toInt
            val si = stack.pop().toInt
            val sa = gcArrayAt(stack.pop(), "array.copy src")
            val di = stack.pop().toInt
            val da = gcArrayAt(stack.pop(), "array.copy dst")
            if (n < 0 || si < 0 || di < 0 ||
                si.toLong + n > sa.elems.length ||
                di.toLong + n > da.elems.length)
              throw new WasmTrap(
                s"array.copy: src $si+$n of ${sa.elems.length}, " +
                  s"dst $di+$n of ${da.elems.length}")
            burn()
            System.arraycopy(sa.elems, si, da.elems, di, n)
          case TableGet(ti) =>
            val t = tableAt(ti); val i = stack.pop().toInt
            if (i < 0 || i >= t.length)
              throw new WasmTrap(s"table.get: index $i of ${t.length}")
            stack.push(t(i))
          case TableSet(ti) =>
            val v = stack.pop(); val t = tableAt(ti)
            val i = stack.pop().toInt
            if (i < 0 || i >= t.length)
              throw new WasmTrap(s"table.set: index $i of ${t.length}")
            t(i) = v
          case TableSize(ti) => stack.push(tableAt(ti).length.toLong)
          case TableGrow(ti) =>
            val n = stack.pop().toInt
            val init = stack.pop()
            val t = tableAt(ti)
            val old = t.length
            // hard 2^22-slot engine cap (32 MB of Longs): a declared max
            // is ATTACKER bytes too, so it can only tighten the cap,
            // never widen it — growth past either fails softly with -1,
            // which the spec licenses for any grow
            val declaredMax = (if (ti < module.tables.size)
              module.tables(ti).max else None).getOrElse(1 << 22)
            val cap = math.min(declaredMax, 1 << 22)
            if (n < 0 || old.toLong + n > cap) stack.push(-1L)
            else {
              val nt = java.util.Arrays.copyOf(t, old + n)
              java.util.Arrays.fill(nt, old, old + n, init)
              tables(ti) = nt
              stack.push(old.toLong)
            }
          case TableFill(ti) =>
            val n = stack.pop().toInt; val v = stack.pop()
            val i = stack.pop().toInt
            val t = tableAt(ti)
            if (n < 0 || i < 0 || i.toLong + n > t.length)
              throw new WasmTrap(s"table.fill: $i+$n of ${t.length}")
            java.util.Arrays.fill(t, i, i + n, v)
          case TableCopy(dt, st) =>
            val n = stack.pop().toInt; val s0 = stack.pop().toInt
            val d0 = stack.pop().toInt
            val dstT = tableAt(dt); val srcT = tableAt(st)
            if (n < 0 || s0 < 0 || d0 < 0 ||
                s0.toLong + n > srcT.length || d0.toLong + n > dstT.length)
              throw new WasmTrap(s"table.copy: dst $d0 src $s0 len $n")
            System.arraycopy(srcT, s0, dstT, d0, n)
          case TableInit(ei, ti) =>
            val n = stack.pop().toInt; val s0 = stack.pop().toInt
            val d0 = stack.pop().toInt
            if (ei >= module.elems.size)
              throw new WasmTrap(s"table.init: no elem segment $ei")
            // a dropped segment behaves as size 0 (like data.drop)
            val seg =
              if (droppedElems(ei)) Vector.empty[Int]
              else module.elems(ei).funcIdxs
            val t = tableAt(ti)
            if (n < 0 || s0 < 0 || d0 < 0 || s0.toLong + n > seg.size ||
                d0.toLong + n > t.length)
              throw new WasmTrap(
                s"table.init: dst $d0 src $s0 len $n of ${seg.size}")
            var k = 0
            while (k < n) { t(d0 + k) = seg(s0 + k).toLong; k += 1 }
          case ElemDrop(ei) =>
            if (ei >= module.elems.size)
              throw new WasmTrap(s"elem.drop: no elem segment $ei")
            droppedElems(ei) = true
          case LocalGet(idx) => stack.push(locals(idx))
          case LocalSet(idx) => locals(idx) = stack.pop()
          case LocalTee(idx) => locals(idx) = stack.peek
          case GlobalGet(idx) => stack.push(globals(idx))
          case GlobalSet(idx) => globals(idx) = stack.pop()
          case MemLoad(op, _, offset) => memLoad(op, offset, stack)
          case MemStore(op, _, offset) => memStore(op, offset, stack)
          case MemorySize => stack.push(memory.length / PageSize)
          case MemoryGrow =>
            val deltaL = popAddr(stack)
            val delta =
              if (deltaL > 65536L) 65536 else deltaL.toInt // cap-bounded
            val oldPages = memory.length / PageSize
            val newPages = oldPages.toLong + delta
            // engine cap 16384 pages (1 GiB): 32768+ pages would
            // overflow the Int byte-array size below, and a declared
            // max is attacker bytes — it only tightens, never widens
            val maxPages = math.min(module.memMaxPages.getOrElse(16384), 16384)
            if (delta < 0 || newPages > maxPages) stack.push(-1L)
            else {
              memory = java.util.Arrays.copyOf(memory, (newPages * PageSize).toInt)
              stack.push(oldPages)
            }
          case MemoryCopy =>
            val lenL = popAddr(stack); val srcL = popAddr(stack)
            val dstL = popAddr(stack)
            checkBounds(srcL, lenL); checkBounds(dstL, lenL)
            System.arraycopy(memory, srcL.toInt, memory, dstL.toInt,
              lenL.toInt)
          case MemoryFill =>
            val lenL = popAddr(stack); val v = stack.pop().toByte
            val dstL = popAddr(stack)
            checkBounds(dstL, lenL)
            java.util.Arrays.fill(memory, dstL.toInt,
              (dstL + lenL).toInt, v)
          case MemoryInit(segIdx) =>
            // spec: for memory64 only the DESTINATION is an i64; the
            // segment offset and length stay i32
            val len = stack.pop().toInt; val src = stack.pop().toInt
            val dstL = popAddr(stack)
            if (segIdx >= module.datas.size)
              throw new WasmTrap(s"memory.init: no data segment $segIdx")
            // a dropped segment behaves as size 0 (spec §4.5.9)
            val seg =
              if (droppedData(segIdx)) Vector.empty[Byte]
              else module.datas(segIdx).bytes
            if (src < 0 || len < 0 || src.toLong + len > seg.size)
              throw new WasmTrap(
                s"memory.init: segment range $src+$len of ${seg.size}")
            checkBounds(dstL, len.toLong)
            val dst = dstL.toInt
            var k = 0
            while (k < len) { memory(dst + k) = seg(src + k); k += 1 }
          case DataDrop(segIdx) =>
            if (segIdx >= module.datas.size)
              throw new WasmTrap(s"data.drop: no data segment $segIdx")
            droppedData(segIdx) = true
          case I32Const(v) => stack.push(v.toLong)
          case I64Const(v) => stack.push(v)
          case F32Const(bits) => stack.push(bits.toLong & 0xFFFFFFFFL)
          case F64Const(bits) => stack.push(bits)
          case Num(op) => numeric(op, stack)
          case TruncSat(sub) => truncSatOp(sub, stack)
          case SimdConst(b) => stack.push(newV(b.toArray))
          case SimdShuffle(lanes) =>
            val b = getV(stack.pop()); val a = getV(stack.pop())
            val out = new Array[Byte](16)
            var k = 0
            while (k < 16) {
              val l = lanes(k)
              out(k) = if (l < 16) a(l) else b(l - 16)
              k += 1
            }
            stack.push(newV(out))
          case SimdMem(sub, _, offset) => simdMem(sub, offset, stack)
          case SimdLane(sub, lane) => simdLane(sub, lane, stack)
          case SimdMemLane(sub, _, offset, lane) =>
            simdMemLane(sub, offset, lane, stack)
          case SimdOp(sub) => simdOp(sub, stack)
          case AtomicOp(sub, _, offset) => atomicOp(sub, offset, stack)
          case AtomicFence => () // single agent: nothing to order
          case other =>
            val sig = evalCold(other, locals, stack)
            if (sig != FALL) return sig
        }
        i += 1
      }
      FALL
    }

    /** COLD-path instructions — the GC cast tier, segment-seeded
     *  arrays, function references/tail calls and exception handling —
     *  live OUTSIDE [[evalSeq]]'s hot match on purpose: HotSpot
     *  refuses to JIT a method past its huge-method bytecode limit,
     *  and folding these ~20 cases into evalSeq pushed it over that
     *  cliff — EVERY guest then ran interpreted, a measured ~30×
     *  wall-clock hit on the wasm bench rows (late r16). Returns a
     *  branch signal; [[FALL]] = fell through, continue the
     *  sequence. */
    private def evalCold(in: Instr, locals: Array[Long],
        stack: OperandStack): Int = in match {
      case CallRef(typeIdx) =>
        val f = popFuncRef(stack, typeIdx, "call_ref")
        val ftype = module.types(typeIdx)
        val argc = ftype.params.size
        val args = new Array[Long](argc)
        var j = argc - 1
        while (j >= 0) { args(j) = stack.pop(); j -= 1 }
        invokeByIndex(f, args.toVector).foreach(stack.push)
        FALL
      case ReturnCall(f) =>
        setTail(f, stack)
        TAIL
      case ReturnCallIndirect(typeIdx, tableIdx) =>
        setTail(indirectTarget(stack, typeIdx, tableIdx), stack)
        TAIL
      case ReturnCallRef(typeIdx) =>
        setTail(popFuncRef(stack, typeIdx, "return_call_ref"), stack)
        TAIL
      case Throw(t) =>
        val argc = module.types(module.tags(t).typeIdx).params.size
        val a = new Array[Long](argc)
        var j = argc - 1
        while (j >= 0) { a(j) = stack.pop(); j -= 1 }
        burn()
        throw new WasmExn(new ExnPackage(t, a.toVector))
      case ThrowRef =>
        val v = stack.pop()
        if (v == -1L)
          throw new WasmTrap("throw_ref: null exception reference")
        burn()
        throw new WasmExn(exnAt(v, "throw_ref"))
      case TryTable(bt, catches, inner) =>
        val h = stack.size - paramArity(bt)
        var sig = FALL
        val caught =
          try {
            evalSeq(inner, locals, stack) match {
              case FALL => ()
              case RET => sig = RET
              case TAIL => sig = TAIL
              case 0 => unwind(stack, h, resultArity(bt))
              case d => sig = d - 1
            }
            null
          } catch { case e: WasmExn => e }
        if (caught == null) sig
        else {
          val pkg = caught.pkg
          // first matching clause, in order (spec dispatch)
          val clause = catches.find {
            case CatchTag(t, _) => t == pkg.tagIdx
            case CatchTagRef(t, _) => t == pkg.tagIdx
            case _ => true
          }
          clause match {
            case None => throw caught // no handler here: keep unwinding
            case Some(c) =>
              while (stack.size > h) { stack.pop(); () }
              c match {
                case CatchTag(_, l) =>
                  pkg.args.foreach(stack.push); l
                case CatchTagRef(_, l) =>
                  pkg.args.foreach(stack.push)
                  stack.push(exnAlloc(pkg)); l
                case CatchAll(l) => l
                case CatchAllRef(l) =>
                  stack.push(exnAlloc(pkg)); l
              }
          }
        }
      case RefAsNonNull =>
        if (stack.peek == -1L)
          throw new WasmTrap("ref.as_non_null: null reference")
        FALL
      case BrOnNull(d) =>
        // branch WITHOUT the ref on null, keep it otherwise
        val v = stack.pop()
        if (v == -1L) d
        else { stack.push(v); FALL }
      case BrOnNonNull(d) =>
        // branch WITH the ref when non-null, drop it otherwise
        if (stack.peek != -1L) d
        else { stack.pop(); FALL }
      case RefTest(ht, nl) =>
        stack.push(if (refMatches(stack.pop(), ht, nl)) 1L else 0L)
        FALL
      case RefCast(ht, nl) =>
        val v = stack.pop()
        if (!refMatches(v, ht, nl)) throw new WasmTrap(
          s"ref.cast: value does not match ${heapTName(ht)}")
        stack.push(v)
        FALL
      case BrOnCast(d, _, _, dstHt, dstNl, onFail) =>
        // the tested value travels with the branch (and with the
        // fallthrough) — peek, don't pop
        if (refMatches(stack.peek, dstHt, dstNl) != onFail) d else FALL
      case AnyConvertExtern | ExternConvertAny =>
        FALL // identity in the shared 64-bit slot encoding; null → null
      case ArrayNewData(t, di) =>
        val e = arrayElem(t)
        val n = stack.pop().toInt
        val off = stack.pop().toInt
        checkGcArrayLen(n)
        val bytes = if (droppedData(di)) Vector.empty[Byte]
          else module.datas(di).bytes
        val w = storageWidth(e.storage)
        if (off < 0 || n < 0 ||
            off.toLong + n.toLong * w > bytes.length)
          throw new WasmTrap(
            s"array.new_data: $off+$n×$w of ${bytes.length}")
        burn()
        val arr = new Array[Long](n)
        var j = 0
        while (j < n) {
          arr(j) = readSegLe(bytes, off + j * w, e.storage); j += 1
        }
        stack.push(gcAlloc(new GcArray(t, arr)))
        FALL
      case ArrayNewElem(t, ei) =>
        arrayElem(t) // array-kind assert (validated; belt + braces)
        val n = stack.pop().toInt
        val off = stack.pop().toInt
        checkGcArrayLen(n)
        val items = if (droppedElems(ei)) Vector.empty[Int]
          else module.elems(ei).funcIdxs
        if (off < 0 || n < 0 || off.toLong + n > items.length)
          throw new WasmTrap(
            s"array.new_elem: $off+$n of ${items.length}")
        burn()
        val arr = new Array[Long](n)
        var j = 0
        while (j < n) { arr(j) = items(off + j).toLong; j += 1 }
        stack.push(gcAlloc(new GcArray(t, arr)))
        FALL
      case ArrayInitData(t, di) =>
        val e = arrayElem(t)
        val n = stack.pop().toInt
        val src = stack.pop().toInt
        val dst = stack.pop().toInt
        val a = gcArrayAt(stack.pop(), "array.init_data")
        val bytes = if (droppedData(di)) Vector.empty[Byte]
          else module.datas(di).bytes
        val w = storageWidth(e.storage)
        if (n < 0 || dst < 0 || src < 0 ||
            dst.toLong + n > a.elems.length ||
            src.toLong + n.toLong * w > bytes.length)
          throw new WasmTrap(
            s"array.init_data: dst $dst+$n of ${a.elems.length}, " +
              s"src $src+$n×$w of ${bytes.length}")
        burn()
        var j = 0
        while (j < n) {
          a.elems(dst + j) = readSegLe(bytes, src + j * w, e.storage)
          j += 1
        }
        FALL
      case ArrayInitElem(t, ei) =>
        arrayElem(t)
        val n = stack.pop().toInt
        val src = stack.pop().toInt
        val dst = stack.pop().toInt
        val a = gcArrayAt(stack.pop(), "array.init_elem")
        val items = if (droppedElems(ei)) Vector.empty[Int]
          else module.elems(ei).funcIdxs
        if (n < 0 || dst < 0 || src < 0 ||
            dst.toLong + n > a.elems.length ||
            src.toLong + n > items.length)
          throw new WasmTrap(
            s"array.init_elem: dst $dst+$n of ${a.elems.length}, " +
              s"src $src+$n of ${items.length}")
        burn()
        var j = 0
        while (j < n) { a.elems(dst + j) = items(src + j).toLong; j += 1 }
        FALL
      case other => throw new IllegalStateException(
        s"hot-path instruction $other reached evalCold")
    }

    /** Result count of a label: 0x40 empty, valtype byte = 1, negative =
     *  `-1 - typeIdx` multi-value func type (see Wasm.Block). */
    private def resultArity(blockType: Int): Int =
      if (blockType == ValType.Empty) 0
      else if (blockType < 0) module.types(-1 - blockType).results.size
      else 1

    /** Param count of a label (only func-type blocktypes take params). */
    private def paramArity(blockType: Int): Int =
      if (blockType < 0) module.types(-1 - blockType).params.size else 0

    /** On exiting a block via br: keep the label's arity from the top,
     *  truncate to entry height, push the kept values back. */
    private def unwind(stack: OperandStack, entryHeight: Int, arity: Int): Unit = {
      if (arity == 0) stack.truncate(entryHeight)
      else {
        val kept = new Array[Long](arity)
        var i = arity - 1
        while (i >= 0) { kept(i) = stack.pop(); i -= 1 }
        stack.truncate(entryHeight)
        var j = 0
        while (j < arity) { stack.push(kept(j)); j += 1 }
      }
    }

    // overflow-safe (memory64 addresses span the full i64 range, and
    // two huge positives must not wrap past the length check)
    private def checkBounds(offset: Long, len: Long): Unit =
      if (offset < 0 || len < 0 || len > memory.length ||
          offset > memory.length - len)
        throw new WasmTrap(
          s"out of bounds memory access ($offset+$len of ${memory.length})")

    /** Pop a memory address/count: full i64 under memory64, otherwise
     *  the u32 interpretation of the i32 slot. Either way the engine's
     *  1 GiB cap means anything past Int range traps at checkBounds
     *  rather than silently truncating. */
    private def popAddr(stack: OperandStack): Long =
      if (module.mem64) stack.pop() else stack.pop() & 0xFFFFFFFFL

    private def addr(offset: Int, stack: OperandStack, width: Int): Int = {
      val base = popAddr(stack)
      if (base < 0 || base > Int.MaxValue.toLong) // memory64 far pointer
        throw new WasmTrap(
          s"out of bounds memory access ($base of ${memory.length})")
      val ea = base + (offset.toLong & 0xFFFFFFFFL)
      checkBounds(ea, width.toLong)
      ea.toInt
    }

    private def ld(a: Int, w: Int): Long = {
      var v = 0L
      var i = w - 1
      while (i >= 0) { v = (v << 8) | (memory(a + i) & 0xFFL); i -= 1 }
      v
    }

    private def st(a: Int, w: Int, v: Long): Unit = {
      var i = 0
      while (i < w) { memory(a + i) = (v >>> (8 * i)).toByte; i += 1 }
    }

    // ---------- simd128 ----------
    // v128 values are 16 little-endian bytes in v128Pool; a stack slot
    // holds the pool index. Lane order and semantics per the simd128
    // proposal merged into WebAssembly 2.0.

    private def newV(b: Array[Byte]): Long = {
      v128Pool += b
      (v128Pool.size - 1).toLong
    }

    private def getV(handle: Long): Array[Byte] = {
      val i = handle.toInt
      if (i < 0 || i >= v128Pool.size)
        throw new WasmTrap(s"bad v128 handle $i (validation gap)")
      v128Pool(i)
    }

    @inline private def vLd(b: Array[Byte], at: Int, w: Int): Long = {
      var v = 0L
      var i = w - 1
      while (i >= 0) { v = (v << 8) | (b(at + i) & 0xFFL); i -= 1 }
      v
    }

    @inline private def vSt(b: Array[Byte], at: Int, w: Int, v: Long): Unit = {
      var i = 0
      while (i < w) { b(at + i) = (v >>> (8 * i)).toByte; i += 1 }
    }

    /** Lane-wise binary over `lanes` lanes of width `w` bytes; `f` sees
     *  sign-extended lane values and returns the new lane (truncated on
     *  store). */
    private def lanewise2(s: OperandStack, w: Int)(f: (Long, Long) => Long): Unit = {
      val b = getV(s.pop()); val a = getV(s.pop())
      val out = new Array[Byte](16)
      val bits = w * 8
      var i = 0
      while (i < 16) {
        val x = (vLd(a, i, w) << (64 - bits)) >> (64 - bits)
        val y = (vLd(b, i, w) << (64 - bits)) >> (64 - bits)
        vSt(out, i, w, f(x, y))
        i += w
      }
      s.push(newV(out))
    }

    private def lanewise1(s: OperandStack, w: Int)(f: Long => Long): Unit = {
      val a = getV(s.pop())
      val out = new Array[Byte](16)
      val bits = w * 8
      var i = 0
      while (i < 16) {
        vSt(out, i, w, f((vLd(a, i, w) << (64 - bits)) >> (64 - bits)))
        i += w
      }
      s.push(newV(out))
    }

    /** Lane-wise shift: vector, scalar count (mod lane bits). */
    private def laneShift(s: OperandStack, w: Int)(f: (Long, Int) => Long): Unit = {
      val count = (s.pop().toInt) & (w * 8 - 1)
      val a = getV(s.pop())
      val out = new Array[Byte](16)
      val bits = w * 8
      var i = 0
      while (i < 16) {
        vSt(out, i, w, f((vLd(a, i, w) << (64 - bits)) >> (64 - bits), count))
        i += w
      }
      s.push(newV(out))
    }

    @inline private def mask(b: Boolean): Long = if (b) -1L else 0L
    @inline private def uns(x: Long, w: Int): Long =
      if (w == 8) x else x & ((1L << (w * 8)) - 1)
    @inline private def satS(v: Long, w: Int): Long = {
      val max = (1L << (w * 8 - 1)) - 1; val min = -(1L << (w * 8 - 1))
      if (v > max) max else if (v < min) min else v
    }
    @inline private def satU(v: Long, w: Int): Long = {
      val max = (1L << (w * 8)) - 1
      if (v > max) max else if (v < 0) 0 else v
    }

    private def f32All(a: Array[Byte]): Array[Float] =
      Array.tabulate(4)(i => java.lang.Float.intBitsToFloat(vLd(a, i * 4, 4).toInt))
    private def f64All(a: Array[Byte]): Array[Double] =
      Array.tabulate(2)(i => java.lang.Double.longBitsToDouble(vLd(a, i * 8, 8)))
    private def packF32(v: Array[Float]): Array[Byte] = {
      val out = new Array[Byte](16)
      var i = 0
      while (i < 4) {
        vSt(out, i * 4, 4, java.lang.Float.floatToRawIntBits(v(i)).toLong)
        i += 1
      }
      out
    }
    private def packF64(v: Array[Double]): Array[Byte] = {
      val out = new Array[Byte](16)
      vSt(out, 0, 8, java.lang.Double.doubleToRawLongBits(v(0)))
      vSt(out, 8, 8, java.lang.Double.doubleToRawLongBits(v(1)))
      out
    }
    private def fbin32(s: OperandStack)(f: (Float, Float) => Float): Unit = {
      val b = f32All(getV(s.pop())); val a = f32All(getV(s.pop()))
      s.push(newV(packF32(Array.tabulate(4)(i => f(a(i), b(i))))))
    }
    private def fbin64(s: OperandStack)(f: (Double, Double) => Double): Unit = {
      val b = f64All(getV(s.pop())); val a = f64All(getV(s.pop()))
      s.push(newV(packF64(Array.tabulate(2)(i => f(a(i), b(i))))))
    }
    private def fun32(s: OperandStack)(f: Float => Float): Unit = {
      val a = f32All(getV(s.pop()))
      s.push(newV(packF32(a.map(f))))
    }
    private def fun64(s: OperandStack)(f: Double => Double): Unit = {
      val a = f64All(getV(s.pop()))
      s.push(newV(packF64(a.map(f))))
    }
    private def fcmp32(s: OperandStack)(f: (Float, Float) => Boolean): Unit = {
      val b = f32All(getV(s.pop())); val a = f32All(getV(s.pop()))
      val out = new Array[Byte](16)
      var i = 0
      while (i < 4) { vSt(out, i * 4, 4, mask(f(a(i), b(i)))); i += 1 }
      s.push(newV(out))
    }
    private def fcmp64(s: OperandStack)(f: (Double, Double) => Boolean): Unit = {
      val b = f64All(getV(s.pop())); val a = f64All(getV(s.pop()))
      val out = new Array[Byte](16)
      vSt(out, 0, 8, mask(f(a(0), b(0)))); vSt(out, 8, 8, mask(f(a(1), b(1))))
      s.push(newV(out))
    }

    private def allTrue(s: OperandStack, w: Int): Unit = {
      val a = getV(s.pop())
      var ok = true
      var i = 0
      while (i < 16) { if (vLd(a, i, w) == 0) ok = false; i += w }
      s.push(if (ok) 1L else 0L)
    }

    private def bitmaskOp(s: OperandStack, w: Int): Unit = {
      val a = getV(s.pop())
      var m = 0L
      var lane = 0
      var i = 0
      while (i < 16) {
        if ((a(i + w - 1) & 0x80) != 0) m |= (1L << lane)
        lane += 1; i += w
      }
      s.push(m)
    }

    /** extend low/high halves: src lane width w → 2w. sub offsets
     *  0/1/2/3 = low_s / high_s / low_u / high_u. */
    private def extend(s: OperandStack, w: Int, variant: Int): Unit = {
      val a = getV(s.pop())
      val out = new Array[Byte](16)
      val signed = variant < 2
      val high = (variant & 1) == 1
      val base = if (high) 8 else 0
      val bits = w * 8
      var i = 0
      while (i < 8 / w) {
        val raw = vLd(a, base + i * w, w)
        val v = if (signed) (raw << (64 - bits)) >> (64 - bits) else raw
        vSt(out, i * 2 * w, 2 * w, v)
        i += 1
      }
      s.push(newV(out))
    }

    /** narrow 2w-lane vectors a ++ b to w lanes with saturation. */
    private def narrow(s: OperandStack, w: Int, signed: Boolean): Unit = {
      val b = getV(s.pop()); val a = getV(s.pop())
      val out = new Array[Byte](16)
      val srcW = 2 * w
      val bits = srcW * 8
      var lane = 0
      while (lane < 16 / w) {
        val src = if (lane < 8 / w) a else b
        val idx = if (lane < 8 / w) lane else lane - 8 / w
        val raw = (vLd(src, idx * srcW, srcW) << (64 - bits)) >> (64 - bits)
        vSt(out, lane * w, w, if (signed) satS(raw, w) else satU(raw, w))
        lane += 1
      }
      s.push(newV(out))
    }

    private def simdMem(sub: Int, offset: Int, stack: OperandStack): Unit =
      sub match {
        case 0 => // v128.load
          val a = addr(offset, stack, 16)
          stack.push(newV(java.util.Arrays.copyOfRange(memory, a, a + 16)))
        case 11 => // v128.store
          val v = getV(stack.pop())
          val a = addr(offset, stack, 16)
          System.arraycopy(v, 0, memory, a, 16)
        case ext if ext >= 1 && ext <= 6 => // load 8x8/16x4/32x2 s/u
          val w = 1 << ((ext - 1) >> 1) // src lane bytes: 1, 2, 4
          val signed = ((ext - 1) & 1) == 0
          val a = addr(offset, stack, 8)
          val out = new Array[Byte](16)
          val bits = w * 8
          var i = 0
          while (i < 8 / w) {
            val raw = ld(a + i * w, w)
            val v = if (signed) (raw << (64 - bits)) >> (64 - bits) else raw
            vSt(out, i * 2 * w, 2 * w, v)
            i += 1
          }
          stack.push(newV(out))
        case spl if spl >= 7 && spl <= 10 => // load8/16/32/64_splat
          val w = 1 << (spl - 7)
          val a = addr(offset, stack, w)
          val v = ld(a, w)
          val out = new Array[Byte](16)
          var i = 0
          while (i < 16) { vSt(out, i, w, v); i += w }
          stack.push(newV(out))
        case 92 | 93 => // load32_zero / load64_zero
          val w = if (sub == 92) 4 else 8
          val a = addr(offset, stack, w)
          val out = new Array[Byte](16)
          vSt(out, 0, w, ld(a, w))
          stack.push(newV(out))
        case other => throw new WasmTrap(s"simd mem subopcode $other")
      }

    private def simdMemLane(sub: Int, offset: Int, lane: Int,
        stack: OperandStack): Unit = {
      val w = 1 << ((sub - 84) & 3)
      val isLoad = sub <= 87
      val v = getV(stack.pop())
      val a = addr(offset, stack, w)
      if (isLoad) {
        val out = v.clone()
        vSt(out, lane * w, w, ld(a, w))
        stack.push(newV(out))
      } else st(a, w, vLd(v, lane * w, w))
    }

    private def simdLane(sub: Int, lane: Int, stack: OperandStack): Unit =
      sub match {
        case 21 => // i8x16.extract_lane_s
          stack.push(getV(stack.pop())(lane).toLong)
        case 22 =>
          stack.push((getV(stack.pop())(lane) & 0xFF).toLong)
        case 23 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          out(lane) = x.toByte; stack.push(newV(out))
        case 24 =>
          stack.push((vLd(getV(stack.pop()), lane * 2, 2) << 48) >> 48)
        case 25 =>
          stack.push(vLd(getV(stack.pop()), lane * 2, 2))
        case 26 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          vSt(out, lane * 2, 2, x); stack.push(newV(out))
        case 27 => // i32x4.extract_lane (sign-extended into the slot)
          stack.push((vLd(getV(stack.pop()), lane * 4, 4) << 32) >> 32)
        case 28 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          vSt(out, lane * 4, 4, x); stack.push(newV(out))
        case 29 =>
          stack.push(vLd(getV(stack.pop()), lane * 8, 8))
        case 30 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          vSt(out, lane * 8, 8, x); stack.push(newV(out))
        case 31 => // f32x4.extract_lane (f32 bits ride the low word)
          stack.push(vLd(getV(stack.pop()), lane * 4, 4))
        case 32 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          vSt(out, lane * 4, 4, x & 0xFFFFFFFFL); stack.push(newV(out))
        case 33 =>
          stack.push(vLd(getV(stack.pop()), lane * 8, 8))
        case 34 =>
          val x = stack.pop(); val out = getV(stack.pop()).clone()
          vSt(out, lane * 8, 8, x); stack.push(newV(out))
        case other => throw new WasmTrap(s"simd lane subopcode $other")
      }

    private def simdOp(sub: Int, s: OperandStack): Unit = sub match {
      case 14 => // i8x16.swizzle
        val idx = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          val j = idx(i) & 0xFF
          out(i) = if (j < 16) a(j) else 0
          i += 1
        }
        s.push(newV(out))
      case 15 | 16 | 17 | 18 => // integer splats
        val w = 1 << (sub - 15)
        val x = s.pop()
        val out = new Array[Byte](16)
        var i = 0
        while (i < 16) { vSt(out, i, w, x); i += w }
        s.push(newV(out))
      case 19 => // f32x4.splat (f32 bits in the low word)
        val x = s.pop() & 0xFFFFFFFFL
        val out = new Array[Byte](16)
        var i = 0
        while (i < 16) { vSt(out, i, 4, x); i += 4 }
        s.push(newV(out))
      case 20 =>
        val x = s.pop()
        val out = new Array[Byte](16)
        vSt(out, 0, 8, x); vSt(out, 8, 8, x)
        s.push(newV(out))

      // integer comparisons: i8x16 35–44, i16x8 45–54, i32x4 55–64
      case c if c >= 35 && c <= 64 =>
        val w = 1 << ((c - 35) / 10)
        val k = (c - 35) % 10
        lanewise2(s, w) { (x, y) =>
          val ux = uns(x, w); val uy = uns(y, w)
          k match {
            case 0 => mask(x == y)
            case 1 => mask(x != y)
            case 2 => mask(x < y)
            case 3 => mask(ux < uy)
            case 4 => mask(x > y)
            case 5 => mask(ux > uy)
            case 6 => mask(x <= y)
            case 7 => mask(ux <= uy)
            case 8 => mask(x >= y)
            case 9 => mask(ux >= uy)
          }
        }
      case c if c >= 65 && c <= 70 => // f32x4 cmp
        val k = c - 65
        fcmp32(s)((a, b) => k match {
          case 0 => a == b
          case 1 => a != b
          case 2 => a < b
          case 3 => a > b
          case 4 => a <= b
          case 5 => a >= b
        })
      case c if c >= 71 && c <= 76 => // f64x2 cmp
        val k = c - 71
        fcmp64(s)((a, b) => k match {
          case 0 => a == b
          case 1 => a != b
          case 2 => a < b
          case 3 => a > b
          case 4 => a <= b
          case 5 => a >= b
        })

      case 77 => // v128.not
        val a = getV(s.pop())
        s.push(newV(a.map(b => (~b).toByte)))
      case 78 | 79 | 80 | 81 => // and andnot or xor
        val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          out(i) = (sub match {
            case 78 => a(i) & b(i)
            case 79 => a(i) & ~b(i)
            case 80 => a(i) | b(i)
            case 81 => a(i) ^ b(i)
          }).toByte
          i += 1
        }
        s.push(newV(out))
      case 82 => // bitselect
        val c = getV(s.pop()); val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          out(i) = ((a(i) & c(i)) | (b(i) & ~c(i))).toByte
          i += 1
        }
        s.push(newV(out))
      case 83 => // v128.any_true
        val a = getV(s.pop())
        s.push(if (a.exists(_ != 0)) 1L else 0L)

      case 94 => // f32x4.demote_f64x2_zero
        val a = f64All(getV(s.pop()))
        s.push(newV(packF32(Array(a(0).toFloat, a(1).toFloat, 0f, 0f))))
      case 95 => // f64x2.promote_low_f32x4
        val a = f32All(getV(s.pop()))
        s.push(newV(packF64(Array(a(0).toDouble, a(1).toDouble))))

      // ---- i8x16 block ----
      case 96 => lanewise1(s, 1)(x => math.abs(x))
      case 97 => lanewise1(s, 1)(x => -x)
      case 98 => lanewise1(s, 1)(x => java.lang.Long.bitCount(x & 0xFF).toLong)
      case 99 => allTrue(s, 1)
      case 100 => bitmaskOp(s, 1)
      case 101 => narrow(s, 1, signed = true)
      case 102 => narrow(s, 1, signed = false)
      case 103 => fun32(s)(x => math.ceil(x.toDouble).toFloat)
      case 104 => fun32(s)(x => math.floor(x.toDouble).toFloat)
      case 105 => fun32(s)(x =>
        (if (x < 0) math.ceil(x.toDouble) else math.floor(x.toDouble)).toFloat)
      case 106 => fun32(s)(x => math.rint(x.toDouble).toFloat)
      case 107 => laneShift(s, 1)((x, n) => x << n)
      case 108 => laneShift(s, 1)((x, n) => x >> n)
      case 109 => laneShift(s, 1)((x, n) => (x & 0xFF) >>> n)
      case 110 => lanewise2(s, 1)(_ + _)
      case 111 => lanewise2(s, 1)((x, y) => satS(x + y, 1))
      case 112 => lanewise2(s, 1)((x, y) => satU(uns(x, 1) + uns(y, 1), 1))
      case 113 => lanewise2(s, 1)(_ - _)
      case 114 => lanewise2(s, 1)((x, y) => satS(x - y, 1))
      case 115 => lanewise2(s, 1)((x, y) => satU(uns(x, 1) - uns(y, 1), 1))
      case 116 => fun64(s)(math.ceil)
      case 117 => fun64(s)(math.floor)
      case 118 => lanewise2(s, 1)(math.min)
      case 119 => lanewise2(s, 1)((x, y) => math.min(uns(x, 1), uns(y, 1)))
      case 120 => lanewise2(s, 1)(math.max)
      case 121 => lanewise2(s, 1)((x, y) => math.max(uns(x, 1), uns(y, 1)))
      case 122 => fun64(s)(x => if (x < 0) math.ceil(x) else math.floor(x))
      case 123 => lanewise2(s, 1)((x, y) => (uns(x, 1) + uns(y, 1) + 1) >> 1)

      // ---- i16x8 block ----
      case 128 => lanewise1(s, 2)(math.abs)
      case 129 => lanewise1(s, 2)(x => -x)
      case 131 => allTrue(s, 2)
      case 132 => bitmaskOp(s, 2)
      case 133 => narrow(s, 2, signed = true)
      case 134 => narrow(s, 2, signed = false)
      case e if e >= 135 && e <= 138 => extend(s, 1, e - 135)
      case 139 => laneShift(s, 2)((x, n) => x << n)
      case 140 => laneShift(s, 2)((x, n) => x >> n)
      case 141 => laneShift(s, 2)((x, n) => (x & 0xFFFF) >>> n)
      case 142 => lanewise2(s, 2)(_ + _)
      case 143 => lanewise2(s, 2)((x, y) => satS(x + y, 2))
      case 144 => lanewise2(s, 2)((x, y) => satU(uns(x, 2) + uns(y, 2), 2))
      case 145 => lanewise2(s, 2)(_ - _)
      case 146 => lanewise2(s, 2)((x, y) => satS(x - y, 2))
      case 147 => lanewise2(s, 2)((x, y) => satU(uns(x, 2) - uns(y, 2), 2))
      case 148 => fun64(s)(math.rint)
      case 149 => lanewise2(s, 2)(_ * _)
      case 150 => lanewise2(s, 2)(math.min)
      case 151 => lanewise2(s, 2)((x, y) => math.min(uns(x, 2), uns(y, 2)))
      case 152 => lanewise2(s, 2)(math.max)
      case 153 => lanewise2(s, 2)((x, y) => math.max(uns(x, 2), uns(y, 2)))
      case 155 => lanewise2(s, 2)((x, y) => (uns(x, 2) + uns(y, 2) + 1) >> 1)

      // ---- i32x4 block ----
      case 160 => lanewise1(s, 4)(math.abs)
      case 161 => lanewise1(s, 4)(x => -x)
      case 163 => allTrue(s, 4)
      case 164 => bitmaskOp(s, 4)
      case e if e >= 167 && e <= 170 => extend(s, 2, e - 167)
      case 171 => laneShift(s, 4)((x, n) => x << n)
      case 172 => laneShift(s, 4)((x, n) => x >> n)
      case 173 => laneShift(s, 4)((x, n) => (x & 0xFFFFFFFFL) >>> n)
      case 174 => lanewise2(s, 4)(_ + _)
      case 177 => lanewise2(s, 4)(_ - _)
      case 181 => lanewise2(s, 4)(_ * _)
      case 182 => lanewise2(s, 4)(math.min)
      case 183 => lanewise2(s, 4)((x, y) => math.min(uns(x, 4), uns(y, 4)))
      case 184 => lanewise2(s, 4)(math.max)
      case 185 => lanewise2(s, 4)((x, y) => math.max(uns(x, 4), uns(y, 4)))
      case 186 => // i32x4.dot_i16x8_s
        val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 4) {
          val x0 = (vLd(a, i * 4, 2) << 48) >> 48
          val y0 = (vLd(b, i * 4, 2) << 48) >> 48
          val x1 = (vLd(a, i * 4 + 2, 2) << 48) >> 48
          val y1 = (vLd(b, i * 4 + 2, 2) << 48) >> 48
          vSt(out, i * 4, 4, x0 * y0 + x1 * y1)
          i += 1
        }
        s.push(newV(out))

      // ---- i64x2 block ----
      case 192 => lanewise1(s, 8)(math.abs)
      case 193 => lanewise1(s, 8)(x => -x)
      case 195 => allTrue(s, 8)
      case 196 => bitmaskOp(s, 8)
      case e if e >= 199 && e <= 202 => extend(s, 4, e - 199)
      case 203 => laneShift(s, 8)((x, n) => x << n)
      case 204 => laneShift(s, 8)((x, n) => x >> n)
      case 205 => laneShift(s, 8)((x, n) => x >>> n)
      case 206 => lanewise2(s, 8)(_ + _)
      case 209 => lanewise2(s, 8)(_ - _)
      case 213 => lanewise2(s, 8)(_ * _)
      case c if c >= 214 && c <= 219 => // i64x2 signed comparisons
        val k = c - 214
        lanewise2(s, 8)((x, y) => k match {
          case 0 => mask(x == y)
          case 1 => mask(x != y)
          case 2 => mask(x < y)
          case 3 => mask(x > y)
          case 4 => mask(x <= y)
          case 5 => mask(x >= y)
        })

      // ---- f32x4 / f64x2 arithmetic ----
      case 224 => fun32(s)(math.abs)
      case 225 => fun32(s)(x => -x)
      case 227 => fun32(s)(x => math.sqrt(x.toDouble).toFloat)
      case 228 => fbin32(s)(_ + _)
      case 229 => fbin32(s)(_ - _)
      case 230 => fbin32(s)(_ * _)
      case 231 => fbin32(s)(_ / _)
      case 232 => fbin32(s)((a, b) => // min (NaN-propagating per spec)
        if (a.isNaN || b.isNaN) Float.NaN else math.min(a, b))
      case 233 => fbin32(s)((a, b) =>
        if (a.isNaN || b.isNaN) Float.NaN else math.max(a, b))
      case 234 => fbin32(s)((a, b) => if (b < a) b else a) // pmin
      case 235 => fbin32(s)((a, b) => if (a < b) b else a) // pmax
      case 236 => fun64(s)(math.abs)
      case 237 => fun64(s)(x => -x)
      case 239 => fun64(s)(math.sqrt)
      case 240 => fbin64(s)(_ + _)
      case 241 => fbin64(s)(_ - _)
      case 242 => fbin64(s)(_ * _)
      case 243 => fbin64(s)(_ / _)
      case 244 => fbin64(s)((a, b) =>
        if (a.isNaN || b.isNaN) Double.NaN else math.min(a, b))
      case 245 => fbin64(s)((a, b) =>
        if (a.isNaN || b.isNaN) Double.NaN else math.max(a, b))
      case 246 => fbin64(s)((a, b) => if (b < a) b else a)
      case 247 => fbin64(s)((a, b) => if (a < b) b else a)

      // ---- conversions ----
      case 248 => // i32x4.trunc_sat_f32x4_s
        val a = f32All(getV(s.pop()))
        val out = new Array[Byte](16)
        var i = 0
        while (i < 4) {
          val v = if (a(i).isNaN) 0L
            else math.max(Int.MinValue.toLong,
              math.min(Int.MaxValue.toLong, a(i).toDouble.toLong))
          vSt(out, i * 4, 4, v)
          i += 1
        }
        s.push(newV(out))
      case 249 => // i32x4.trunc_sat_f32x4_u
        val a = f32All(getV(s.pop()))
        val out = new Array[Byte](16)
        var i = 0
        while (i < 4) {
          val v = if (a(i).isNaN) 0L
            else math.max(0L, math.min(0xFFFFFFFFL, a(i).toDouble.toLong))
          vSt(out, i * 4, 4, v)
          i += 1
        }
        s.push(newV(out))
      case 250 => // f32x4.convert_i32x4_s
        val a = getV(s.pop())
        s.push(newV(packF32(Array.tabulate(4)(i =>
          ((vLd(a, i * 4, 4) << 32) >> 32).toFloat))))
      case 251 => // f32x4.convert_i32x4_u
        val a = getV(s.pop())
        s.push(newV(packF32(Array.tabulate(4)(i => vLd(a, i * 4, 4).toFloat))))
      case 252 | 253 => // i32x4.trunc_sat_f64x2_s/_u_zero
        val a = f64All(getV(s.pop()))
        val signed = sub == 252
        val out = new Array[Byte](16)
        var i = 0
        while (i < 2) {
          val v =
            if (a(i).isNaN) 0L
            else if (signed) math.max(Int.MinValue.toLong,
              math.min(Int.MaxValue.toLong, a(i).toLong))
            else math.max(0L, math.min(0xFFFFFFFFL, a(i).toLong))
          vSt(out, i * 4, 4, v)
          i += 1
        }
        s.push(newV(out))
      case 254 => // f64x2.convert_low_i32x4_s
        val a = getV(s.pop())
        s.push(newV(packF64(Array.tabulate(2)(i =>
          ((vLd(a, i * 4, 4) << 32) >> 32).toDouble))))
      case 255 => // f64x2.convert_low_i32x4_u
        val a = getV(s.pop())
        s.push(newV(packF64(Array.tabulate(2)(i => vLd(a, i * 4, 4).toDouble))))

      // ---- widening / fixed-point family ----
      case 130 => // i16x8.q15mulr_sat_s
        lanewise2(s, 2)((x, y) => satS((x * y + 0x4000) >> 15, 2))
      case e if e >= 124 && e <= 127 => // extadd_pairwise
        val srcW = if (e <= 125) 1 else 2
        val signed = (e & 1) == 0
        val a = getV(s.pop())
        val out = new Array[Byte](16)
        val bits = srcW * 8
        var j = 0
        while (j < 8 / srcW) {
          def ext(at: Int): Long = {
            val raw = vLd(a, at, srcW)
            if (signed) (raw << (64 - bits)) >> (64 - bits) else raw
          }
          vSt(out, j * 2 * srcW, 2 * srcW,
            ext(j * 2 * srcW) + ext(j * 2 * srcW + srcW))
          j += 1
        }
        s.push(newV(out))
      case e if (e >= 156 && e <= 159) || (e >= 188 && e <= 191) ||
          (e >= 220 && e <= 223) => // extmul low/high s/u
        val srcW = if (e <= 159) 1 else if (e <= 191) 2 else 4
        val variant = (e - (if (e <= 159) 156 else if (e <= 191) 188 else 220))
        val signed = variant < 2
        val high = (variant & 1) == 1
        val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        val base = if (high) 8 else 0
        val bits = srcW * 8
        var j = 0
        while (j < 8 / srcW) {
          def ext(v: Array[Byte]): Long = {
            val raw = vLd(v, base + j * srcW, srcW)
            if (signed) (raw << (64 - bits)) >> (64 - bits) else raw
          }
          vSt(out, j * 2 * srcW, 2 * srcW, ext(a) * ext(b))
          j += 1
        }
        s.push(newV(out))
      // ---- relaxed-simd (0x100–0x113), DETERMINISTIC PROFILE ----
      // Each relaxed op is spec-licensed to pick any behavior from its
      // allowed set; this engine always picks the STRICT sibling's
      // (swizzle OOB→0, trunc saturates with NaN→0, madd unfused,
      // laneselect ≡ bitselect, min/max NaN-propagating, q15mulr
      // saturating, dot treats the i7x16 operand as signed i8 with i16
      // intermediate saturation) — fixed and reproducible across runs.
      case 256 => simdOp(14, s) // i8x16.relaxed_swizzle
      case 257 => simdOp(248, s) // i32x4.relaxed_trunc_f32x4_s
      case 258 => simdOp(249, s) // i32x4.relaxed_trunc_f32x4_u
      case 259 => simdOp(252, s) // i32x4.relaxed_trunc_f64x2_s_zero
      case 260 => simdOp(253, s) // i32x4.relaxed_trunc_f64x2_u_zero
      case 261 | 262 => // f32x4.relaxed_madd / nmadd (unfused)
        val c = f32All(getV(s.pop()))
        val b = f32All(getV(s.pop()))
        val a = f32All(getV(s.pop()))
        s.push(newV(packF32(Array.tabulate(4) { i =>
          (if (sub == 262) -(a(i) * b(i)) else a(i) * b(i)) + c(i)
        })))
      case 263 | 264 => // f64x2.relaxed_madd / nmadd (unfused)
        val c = f64All(getV(s.pop()))
        val b = f64All(getV(s.pop()))
        val a = f64All(getV(s.pop()))
        s.push(newV(packF64(Array.tabulate(2) { i =>
          (if (sub == 264) -(a(i) * b(i)) else a(i) * b(i)) + c(i)
        })))
      case c if c >= 265 && c <= 268 => simdOp(82, s) // relaxed_laneselect
      case 269 => simdOp(232, s) // f32x4.relaxed_min
      case 270 => simdOp(233, s) // f32x4.relaxed_max
      case 271 => simdOp(244, s) // f64x2.relaxed_min
      case 272 => simdOp(245, s) // f64x2.relaxed_max
      case 273 => simdOp(130, s) // i16x8.relaxed_q15mulr_s
      case 274 => // i16x8.relaxed_dot_i8x16_i7x16_s
        val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 8) {
          val p = a(2 * i).toLong * b(2 * i) + a(2 * i + 1).toLong * b(2 * i + 1)
          vSt(out, i * 2, 2, satS(p, 2))
          i += 1
        }
        s.push(newV(out))
      case 275 => // i32x4.relaxed_dot_i8x16_i7x16_add_s
        val c = getV(s.pop()); val b = getV(s.pop()); val a = getV(s.pop())
        val out = new Array[Byte](16)
        var i = 0
        while (i < 4) {
          val lo = satS(a(4 * i).toLong * b(4 * i) +
            a(4 * i + 1).toLong * b(4 * i + 1), 2)
          val hi = satS(a(4 * i + 2).toLong * b(4 * i + 2) +
            a(4 * i + 3).toLong * b(4 * i + 3), 2)
          vSt(out, i * 4, 4, (lo + hi + vLd(c, i * 4, 4).toInt).toInt.toLong)
          i += 1
        }
        s.push(newV(out))
      case other => throw new WasmTrap(s"simd128 subopcode $other unassigned")
    }

    // ---------- atomics (threads tier, single-agent semantics) ----------
    // Sequential execution IS the exact semantics when only one agent
    // exists: every rmw is trivially indivisible. The observable
    // differences the spec keeps even then are honored — natural
    // ALIGNMENT traps, wait/notify return codes, and an infinite wait
    // (which no second agent could ever notify) trapping loudly rather
    // than hanging an executor.

    /** Width by position-in-family k: i32, i64, 32_8u, 32_16u, 64_8u,
     *  64_16u, 64_32u. */
    private def atomicWidth(k: Int): Int = k match {
      case 0 | 6 => 4
      case 1 => 8
      case 2 | 4 => 1
      case _ => 2
    }

    private def atomicOp(sub: Int, offset: Int, stack: OperandStack): Unit = {
      @inline def ea(w: Int): Int = {
        val a = addr(offset, stack, w)
        if (a % w != 0)
          throw new WasmTrap(s"unaligned atomic access at $a (width $w)")
        a
      }
      // i32-family results re-enter the slot model sign-extended (like
      // i32.load); narrow _u forms and i64 stay zero-extended/full
      @inline def pushOld(k: Int, old: Long): Unit =
        stack.push(if (k == 0) old.toInt.toLong else old)
      sub match {
        case 0x00 => // memory.atomic.notify: no waiters can exist
          stack.pop() // count
          ea(4)
          stack.push(0L)
        case 0x01 | 0x02 => // memory.atomic.wait32 / wait64
          val w = if (sub == 0x01) 4 else 8
          val timeout = stack.pop()
          val expected = stack.pop()
          val cur = ld(ea(w), w)
          val exp = if (w == 4) expected & 0xFFFFFFFFL else expected
          if (cur != exp) stack.push(1L) // "not-equal"
          else if (timeout >= 0) stack.push(2L) // elapses: none can notify
          else throw new WasmTrap(
            "memory.atomic.wait with infinite timeout would deadlock " +
              "(single-agent engine)")
        case l if l >= 0x10 && l <= 0x16 => // atomic loads (narrow = _u)
          val k = l - 0x10; val w = atomicWidth(k)
          pushOld(k, ld(ea(w), w))
        case st_ if st_ >= 0x17 && st_ <= 0x1D => // atomic stores
          val k = st_ - 0x17; val w = atomicWidth(k)
          val v = stack.pop()
          st(ea(w), w, v)
        case rmw if rmw >= 0x1E && rmw <= 0x47 => // add sub and or xor xchg
          val fam = (rmw - 0x1E) / 7
          val k = (rmw - 0x1E) % 7
          val w = atomicWidth(k)
          val v = stack.pop()
          val a = ea(w)
          val old = ld(a, w)
          st(a, w, fam match {
            case 0 => old + v
            case 1 => old - v
            case 2 => old & v
            case 3 => old | v
            case 4 => old ^ v
            case _ => v // xchg
          })
          pushOld(k, old)
        case cx if cx >= 0x48 && cx <= 0x4E => // cmpxchg
          val k = cx - 0x48
          val w = atomicWidth(k)
          val repl = stack.pop()
          val expected = stack.pop()
          val a = ea(w)
          val old = ld(a, w)
          val expT = w match {
            case 1 => expected & 0xFFL
            case 2 => expected & 0xFFFFL
            case 4 => expected & 0xFFFFFFFFL
            case _ => expected
          }
          if (old == expT) st(a, w, repl)
          pushOld(k, old)
        case other => throw new WasmTrap(
          f"atomic subopcode 0x$other%02X unassigned")
      }
    }

    private def memLoad(op: Int, offset: Int, stack: OperandStack): Unit = op match {
      case 0x28 => stack.push(ld(addr(offset, stack, 4), 4).toInt.toLong) // i32.load
      case 0x29 => stack.push(ld(addr(offset, stack, 8), 8)) // i64.load
      case 0x2A => stack.push(ld(addr(offset, stack, 4), 4)) // f32.load (bits)
      case 0x2B => stack.push(ld(addr(offset, stack, 8), 8)) // f64.load (bits)
      case 0x2C => stack.push(ld(addr(offset, stack, 1), 1).toByte.toLong) // i32.load8_s
      case 0x2D => stack.push(ld(addr(offset, stack, 1), 1)) // i32.load8_u
      case 0x2E => stack.push(ld(addr(offset, stack, 2), 2).toShort.toLong) // i32.load16_s
      case 0x2F => stack.push(ld(addr(offset, stack, 2), 2)) // i32.load16_u
      case 0x30 => stack.push(ld(addr(offset, stack, 1), 1).toByte.toLong) // i64.load8_s
      case 0x31 => stack.push(ld(addr(offset, stack, 1), 1)) // i64.load8_u
      case 0x32 => stack.push(ld(addr(offset, stack, 2), 2).toShort.toLong) // i64.load16_s
      case 0x33 => stack.push(ld(addr(offset, stack, 2), 2)) // i64.load16_u
      case 0x34 => stack.push(ld(addr(offset, stack, 4), 4).toInt.toLong) // i64.load32_s
      case 0x35 => stack.push(ld(addr(offset, stack, 4), 4)) // i64.load32_u
      case other => throw new WasmTrap(f"unsupported load 0x$other%02X")
    }

    private def memStore(op: Int, offset: Int, stack: OperandStack): Unit = {
      val v = stack.pop()
      op match {
        case 0x36 => st(addr(offset, stack, 4), 4, v) // i32.store
        case 0x37 => st(addr(offset, stack, 8), 8, v) // i64.store
        case 0x38 => st(addr(offset, stack, 4), 4, v) // f32.store
        case 0x39 => st(addr(offset, stack, 8), 8, v) // f64.store
        case 0x3A => st(addr(offset, stack, 1), 1, v) // i32.store8
        case 0x3B => st(addr(offset, stack, 2), 2, v) // i32.store16
        case 0x3C => st(addr(offset, stack, 1), 1, v) // i64.store8
        case 0x3D => st(addr(offset, stack, 2), 2, v) // i64.store16
        case 0x3E => st(addr(offset, stack, 4), 4, v) // i64.store32
        case other => throw new WasmTrap(f"unsupported store 0x$other%02X")
      }
    }

    /** Signed float→int truncation with the spec's traps (NaN, out of
     *  range — WebAssembly spec §4.3.2 trunc_s). */
    private def truncTrap(d: Double, lo: Long, hi: Long): Long = {
      if (d.isNaN) throw new WasmTrap("invalid conversion to integer")
      val t = if (d < 0) math.ceil(d) else math.floor(d)
      if (t < lo.toDouble || t > hi.toDouble)
        throw new WasmTrap("integer overflow")
      t.toLong
    }

    /** Unsigned float→int truncation (result returned as the raw bits).
     *  The high-path comparison is STRICT: Long.MaxValue.toDouble rounds
     *  up to exactly 2^63, so `t <= that` would send t == 2^63 through
     *  Double.toLong (which saturates to 2^63−1) instead of producing
     *  the correct raw bits 0x8000000000000000. */
    private def truncTrapU(d: Double, hi: Double): Long = {
      if (d.isNaN) throw new WasmTrap("invalid conversion to integer")
      val t = if (d < 0) math.ceil(d) else math.floor(d)
      if (t < 0.0 || t > hi) throw new WasmTrap("integer overflow")
      if (t < 9.223372036854776e18) t.toLong
      else (t - 9.223372036854776e18).toLong | Long.MinValue
    }

    /** Signed SATURATING truncation (spec §4.3.2 trunc_sat_s): NaN → 0,
     *  out-of-range clamps to [lo, hi] instead of trapping. */
    private def truncSatS(d: Double, lo: Long, hi: Long): Long = {
      if (d.isNaN) 0L
      else {
        val t = if (d < 0) math.ceil(d) else math.floor(d)
        if (t <= lo.toDouble) lo
        else if (t >= hi.toDouble) hi
        else t.toLong
      }
    }

    /** Unsigned SATURATING truncation: NaN → 0, negative → 0, above the
     *  type's max (`hi`, as a double) → `max` (the max as raw bits).
     *  Strict `<` on the high-path split for the same 2^63 boundary
     *  reason as [[truncTrapU]]. */
    private def truncSatU(d: Double, hi: Double, max: Long): Long = {
      if (d.isNaN) 0L
      else {
        val t = if (d < 0) math.ceil(d) else math.floor(d)
        if (t <= 0.0) 0L
        else if (t >= hi) max
        else if (t < 9.223372036854776e18) t.toLong
        else (t - 9.223372036854776e18).toLong | Long.MinValue
      }
    }

    /** 0xFC 0–7: the saturating conversion matrix. i32 results are pushed
     *  sign-extended (the stack's i32 representation, matching 0xA8–0xAB);
     *  i64 unsigned results are the raw 64 bits. */
    private def truncSatOp(sub: Int, s: OperandStack): Unit = {
      @inline def f64 = java.lang.Double.longBitsToDouble(s.pop())
      @inline def f32 = java.lang.Float.intBitsToFloat(s.pop().toInt).toDouble
      sub match {
        case 0 => s.push(truncSatS(f32, Int.MinValue, Int.MaxValue).toInt.toLong) // i32.trunc_sat_f32_s
        case 1 => s.push(truncSatU(f32, 4294967296.0, 0xFFFFFFFFL).toInt.toLong) // i32.trunc_sat_f32_u
        case 2 => s.push(truncSatS(f64, Int.MinValue, Int.MaxValue).toInt.toLong) // i32.trunc_sat_f64_s
        case 3 => s.push(truncSatU(f64, 4294967296.0, 0xFFFFFFFFL).toInt.toLong) // i32.trunc_sat_f64_u
        case 4 => s.push(truncSatS(f32, Long.MinValue, Long.MaxValue)) // i64.trunc_sat_f32_s
        case 5 => s.push(truncSatU(f32, 1.8446744073709552e19, -1L)) // i64.trunc_sat_f32_u
        case 6 => s.push(truncSatS(f64, Long.MinValue, Long.MaxValue)) // i64.trunc_sat_f64_s
        case 7 => s.push(truncSatU(f64, 1.8446744073709552e19, -1L)) // i64.trunc_sat_f64_u
        case other => throw new WasmTrap(s"unsupported trunc_sat subopcode $other")
      }
    }

    private def numeric(op: Int, s: OperandStack): Unit = {
      @inline def i32 = s.pop().toInt
      @inline def i64 = s.pop()
      @inline def f64 = java.lang.Double.longBitsToDouble(s.pop())
      @inline def f32 = java.lang.Float.intBitsToFloat(s.pop().toInt)
      @inline def pushI(v: Int): Unit = s.push(v.toLong)
      @inline def pushB(v: Boolean): Unit = s.push(if (v) 1L else 0L)
      @inline def pushL(v: Long): Unit = s.push(v)
      @inline def pushF(v: Float): Unit =
        s.push(java.lang.Float.floatToRawIntBits(v).toLong & 0xFFFFFFFFL)
      @inline def pushD(v: Double): Unit =
        s.push(java.lang.Double.doubleToRawLongBits(v))
      op match {
        // i32 compare
        case 0x45 => pushB(i32 == 0)
        case 0x46 => val b = i32; pushB(i32 == b)
        case 0x47 => val b = i32; pushB(i32 != b)
        case 0x48 => val b = i32; pushB(i32 < b)
        case 0x49 => val b = i32; pushB(java.lang.Integer.compareUnsigned(i32, b) < 0)
        case 0x4A => val b = i32; pushB(i32 > b)
        case 0x4B => val b = i32; pushB(java.lang.Integer.compareUnsigned(i32, b) > 0)
        case 0x4C => val b = i32; pushB(i32 <= b)
        case 0x4D => val b = i32; pushB(java.lang.Integer.compareUnsigned(i32, b) <= 0)
        case 0x4E => val b = i32; pushB(i32 >= b)
        case 0x4F => val b = i32; pushB(java.lang.Integer.compareUnsigned(i32, b) >= 0)
        // i64 compare
        case 0x50 => pushB(i64 == 0L)
        case 0x51 => val b = i64; pushB(i64 == b)
        case 0x52 => val b = i64; pushB(i64 != b)
        case 0x53 => val b = i64; pushB(i64 < b)
        case 0x54 => val b = i64; pushB(java.lang.Long.compareUnsigned(i64, b) < 0)
        case 0x55 => val b = i64; pushB(i64 > b)
        case 0x56 => val b = i64; pushB(java.lang.Long.compareUnsigned(i64, b) > 0)
        case 0x57 => val b = i64; pushB(i64 <= b)
        case 0x58 => val b = i64; pushB(java.lang.Long.compareUnsigned(i64, b) <= 0)
        case 0x59 => val b = i64; pushB(i64 >= b)
        case 0x5A => val b = i64; pushB(java.lang.Long.compareUnsigned(i64, b) >= 0)
        // f32 compare
        case 0x5B => val b = f32; pushB(f32 == b)
        case 0x5C => val b = f32; pushB(f32 != b)
        case 0x5D => val b = f32; pushB(f32 < b)
        case 0x5E => val b = f32; pushB(f32 > b)
        case 0x5F => val b = f32; pushB(f32 <= b)
        case 0x60 => val b = f32; pushB(f32 >= b)
        // f64 compare
        case 0x61 => val b = f64; pushB(f64 == b)
        case 0x62 => val b = f64; pushB(f64 != b)
        case 0x63 => val b = f64; pushB(f64 < b)
        case 0x64 => val b = f64; pushB(f64 > b)
        case 0x65 => val b = f64; pushB(f64 <= b)
        case 0x66 => val b = f64; pushB(f64 >= b)
        // i32 arithmetic
        case 0x67 => pushI(java.lang.Integer.numberOfLeadingZeros(i32))
        case 0x68 => pushI(java.lang.Integer.numberOfTrailingZeros(i32))
        case 0x69 => pushI(java.lang.Integer.bitCount(i32))
        case 0x6A => val b = i32; pushI(i32 + b)
        case 0x6B => val b = i32; pushI(i32 - b)
        case 0x6C => val b = i32; pushI(i32 * b)
        case 0x6D =>
          val b = i32; val a = i32
          if (b == 0) throw new WasmTrap("integer divide by zero")
          if (a == Int.MinValue && b == -1) throw new WasmTrap("integer overflow")
          pushI(a / b)
        case 0x6E =>
          val b = i32; val a = i32
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushI(java.lang.Integer.divideUnsigned(a, b))
        case 0x6F =>
          val b = i32; val a = i32
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushI(if (a == Int.MinValue && b == -1) 0 else a % b)
        case 0x70 =>
          val b = i32; val a = i32
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushI(java.lang.Integer.remainderUnsigned(a, b))
        case 0x71 => val b = i32; pushI(i32 & b)
        case 0x72 => val b = i32; pushI(i32 | b)
        case 0x73 => val b = i32; pushI(i32 ^ b)
        case 0x74 => val b = i32; pushI(i32 << (b & 31))
        case 0x75 => val b = i32; pushI(i32 >> (b & 31))
        case 0x76 => val b = i32; pushI(i32 >>> (b & 31))
        case 0x77 => val b = i32; pushI(java.lang.Integer.rotateLeft(i32, b))
        case 0x78 => val b = i32; pushI(java.lang.Integer.rotateRight(i32, b))
        // i64 arithmetic
        case 0x79 => pushL(java.lang.Long.numberOfLeadingZeros(i64).toLong)
        case 0x7A => pushL(java.lang.Long.numberOfTrailingZeros(i64).toLong)
        case 0x7B => pushL(java.lang.Long.bitCount(i64).toLong)
        case 0x7C => val b = i64; pushL(i64 + b)
        case 0x7D => val b = i64; pushL(i64 - b)
        case 0x7E => val b = i64; pushL(i64 * b)
        case 0x7F =>
          val b = i64; val a = i64
          if (b == 0) throw new WasmTrap("integer divide by zero")
          if (a == Long.MinValue && b == -1) throw new WasmTrap("integer overflow")
          pushL(a / b)
        case 0x80 =>
          val b = i64; val a = i64
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushL(java.lang.Long.divideUnsigned(a, b))
        case 0x81 =>
          val b = i64; val a = i64
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushL(if (a == Long.MinValue && b == -1) 0L else a % b)
        case 0x82 =>
          val b = i64; val a = i64
          if (b == 0) throw new WasmTrap("integer divide by zero")
          pushL(java.lang.Long.remainderUnsigned(a, b))
        case 0x83 => val b = i64; pushL(i64 & b)
        case 0x84 => val b = i64; pushL(i64 | b)
        case 0x85 => val b = i64; pushL(i64 ^ b)
        case 0x86 => val b = i64; pushL(i64 << (b & 63))
        case 0x87 => val b = i64; pushL(i64 >> (b & 63))
        case 0x88 => val b = i64; pushL(i64 >>> (b & 63))
        case 0x89 => val b = i64; pushL(java.lang.Long.rotateLeft(i64, b.toInt))
        case 0x8A => val b = i64; pushL(java.lang.Long.rotateRight(i64, b.toInt))
        // f32 arithmetic
        case 0x8B => pushF(math.abs(f32))
        case 0x8C => pushF(-f32)
        case 0x8D => pushF(math.ceil(f32.toDouble).toFloat)
        case 0x8E => pushF(math.floor(f32.toDouble).toFloat)
        case 0x8F => pushF(f32.toDouble match { // trunc toward zero
          case d if d < 0 => math.ceil(d).toFloat
          case d => math.floor(d).toFloat
        })
        case 0x90 => pushF(math.rint(f32.toDouble).toFloat) // nearest (ties-to-even)
        case 0x91 => pushF(math.sqrt(f32.toDouble).toFloat)
        case 0x92 => val b = f32; pushF(f32 + b)
        case 0x93 => val b = f32; pushF(f32 - b)
        case 0x94 => val b = f32; pushF(f32 * b)
        case 0x95 => val b = f32; pushF(f32 / b)
        case 0x96 => val b = f32; pushF(math.min(f32, b))
        case 0x97 => val b = f32; pushF(math.max(f32, b))
        case 0x98 => val b = f32; pushF(math.copySign(f32, b))
        // f64 arithmetic
        case 0x99 => pushD(math.abs(f64))
        case 0x9A => pushD(-f64)
        case 0x9B => pushD(math.ceil(f64))
        case 0x9C => pushD(math.floor(f64))
        case 0x9D => pushD(f64 match { // trunc toward zero
          case d if d < 0 => math.ceil(d)
          case d => math.floor(d)
        })
        case 0x9E => pushD(math.rint(f64)) // nearest (ties-to-even)
        case 0x9F => pushD(math.sqrt(f64))
        case 0xA0 => val b = f64; pushD(f64 + b)
        case 0xA1 => val b = f64; pushD(f64 - b)
        case 0xA2 => val b = f64; pushD(f64 * b)
        case 0xA3 => val b = f64; pushD(f64 / b)
        case 0xA4 => val b = f64; pushD(math.min(f64, b))
        case 0xA5 => val b = f64; pushD(math.max(f64, b))
        case 0xA6 => val b = f64; pushD(math.copySign(f64, b))
        // conversions
        case 0xA7 => pushI(i64.toInt) // i32.wrap_i64
        case 0xA8 => pushI(truncTrap(f32.toDouble, Int.MinValue, Int.MaxValue).toInt) // i32.trunc_f32_s
        case 0xA9 => pushI(truncTrapU(f32.toDouble, 4294967295.0).toInt) // i32.trunc_f32_u
        case 0xAA => pushI(truncTrap(f64, Int.MinValue, Int.MaxValue).toInt) // i32.trunc_f64_s
        case 0xAB => pushI(truncTrapU(f64, 4294967295.0).toInt) // i32.trunc_f64_u
        case 0xAC => pushL(i32.toLong) // i64.extend_i32_s
        case 0xAD => pushL(i32.toLong & 0xFFFFFFFFL) // i64.extend_i32_u
        case 0xAE => pushL(truncTrap(f32.toDouble, Long.MinValue, Long.MaxValue)) // i64.trunc_f32_s
        case 0xAF => pushL(truncTrapU(f32.toDouble, 1.8446744073709552e19)) // i64.trunc_f32_u
        case 0xB0 => pushL(truncTrap(f64, Long.MinValue, Long.MaxValue)) // i64.trunc_f64_s
        case 0xB1 => pushL(truncTrapU(f64, 1.8446744073709552e19)) // i64.trunc_f64_u
        case 0xB2 => pushF(i32.toFloat) // f32.convert_i32_s
        case 0xB3 => pushF((i32.toLong & 0xFFFFFFFFL).toFloat) // f32.convert_i32_u
        case 0xB4 => pushF(i64.toFloat) // f32.convert_i64_s
        case 0xB5 => // f32.convert_i64_u
          val v = i64
          pushF(if (v >= 0) v.toFloat
            else ((v >>> 1) | (v & 1L)).toFloat * 2.0f)
        case 0xB6 => pushF(f64.toFloat) // f32.demote_f64
        case 0xB7 => pushD(i32.toDouble) // f64.convert_i32_s
        case 0xB8 => pushD((i32.toLong & 0xFFFFFFFFL).toDouble) // f64.convert_i32_u
        case 0xB9 => pushD(i64.toDouble) // f64.convert_i64_s
        case 0xBA => // f64.convert_i64_u
          val v = i64
          pushD(if (v >= 0) v.toDouble
            else ((v >>> 1) | (v & 1L)).toDouble * 2.0)
        case 0xBB => pushD(f32.toDouble) // f64.promote_f32
        case 0xBC => pushI(s.pop().toInt) // i32.reinterpret_f32 (sign-extend bits)
        case 0xBD => // i64.reinterpret_f64 (bit-identical slot)
        case 0xBE => s.push(s.pop() & 0xFFFFFFFFL) // f32.reinterpret_i32 (zero-extend)
        case 0xBF => // f64.reinterpret_i64 (bit-identical slot)
        // sign-extension operators (post-MVP, emitted by LLVM by default)
        case 0xC0 => pushI(i32.toByte.toInt) // i32.extend8_s
        case 0xC1 => pushI(i32.toShort.toInt) // i32.extend16_s
        case 0xC2 => pushL(i64.toByte.toLong) // i64.extend8_s
        case 0xC3 => pushL(i64.toShort.toLong) // i64.extend16_s
        case 0xC4 => pushL(i64.toInt.toLong) // i64.extend32_s
        case other => throw new WasmTrap(f"unsupported numeric opcode 0x$other%02X")
      }
    }
  }

  /** Minimal growable Long stack (no boxing). */
  private[wasm] final class OperandStack {
    private var arr = new Array[Long](64)
    private var top = 0
    def push(v: Long): Unit = {
      if (top == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(top) = v; top += 1
    }
    def pop(): Long = {
      if (top == 0) throw new WasmTrap("operand stack underflow")
      top -= 1; arr(top)
    }
    def peek: Long = {
      if (top == 0) throw new WasmTrap("operand stack underflow")
      arr(top - 1)
    }
    def size: Int = top
    def truncate(h: Int): Unit = top = h
  }

  def instantiate(
      moduleBytes: Array[Byte],
      imports: Map[(String, String), Vector[Long] => Vector[Long]]): Instance =
    new Instance(moduleOf(moduleBytes), imports)
}
