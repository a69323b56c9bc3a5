package graft.wasm

/**
 * WebAssembly validation (spec §3) over the [[WasmModule]] AST: the
 * appendix's type-stack algorithm for function bodies (operand types,
 * label arity, unreachable polymorphism) plus module-level index and
 * limit checks (type/func/table/global/segment indices, global init
 * exprs, export kinds, start signature).
 *
 * Runs once per [[WasmInterp.Instance]] construction — the reference's
 * embedded runtimes all validate before execution (reference:
 * host-go/runtimes/wasmtime/runtime.go:164-227 instantiation path), so a
 * type-discipline-breaking module fails HERE by name before a single
 * instruction executes, instead of surfacing as a raw index error deep
 * in the evaluator. Cost: one linear pass over a few hundred
 * instructions per instance, negligible next to the per-partition
 * interpretation work it guards.
 *
 * 100 TB shape: validation is per-(executor, partition) over a few-KB
 * broadcast module — no data-plane cost.
 */
object WasmValidate {
  import ValType._

  /** Bottom type for unreachable polymorphism: matches anything. */
  private val Unknown: Byte = 0

  private def tyName(t: Byte): String = t match {
    case I32 => "i32"
    case I64 => "i64"
    case F32 => "f32"
    case F64 => "f64"
    case V128 => "v128"
    case Funcref => "funcref"
    case Externref => "externref"
    case Anyref => "anyref"
    case Eqref => "eqref"
    case I31ref => "i31ref"
    case Structref => "structref"
    case Arrayref => "arrayref"
    case Noneref => "nullref"
    case NoExternref => "nullexternref"
    case NoFuncref => "nullfuncref"
    case Exnref => "exnref"
    case PackedI8 => "i8"
    case PackedI16 => "i16"
    case Unknown => "unknown"
    case other => f"0x$other%02X"
  }

  def validate(m: WasmModule): Unit = {
    def err(s: String): Nothing =
      throw new WasmValidateError(s"invalid module: $s")

    val nTypes = m.types.size
    def isFuncComp(t: Int): Boolean = m.comp(t) match {
      case CFunc(_) => true
      case _ => false
    }
    m.imports.zipWithIndex.foreach { case (imp, i) =>
      if (imp.typeIdx < 0 || imp.typeIdx >= nTypes)
        err(s"import #$i (${imp.module}.${imp.name}): type index " +
          s"${imp.typeIdx} of $nTypes")
      if (!isFuncComp(imp.typeIdx))
        err(s"import #$i (${imp.module}.${imp.name}): type index " +
          s"${imp.typeIdx} is not a function type")
    }
    // wasm-gc composite hygiene: v128 fields are rejected because the
    // v128 side pool's per-call compaction cannot track field-held
    // handles; struct/array-kind globals are rejected because the gc
    // ARENA is reclaimed per outermost invocation (WasmInterp.gcHeap) —
    // a surviving global would dangle. Both reject by NAME.
    m.comps.zipWithIndex.foreach { case (c, i) =>
      def fieldOk(f: FieldType, what: String): Unit =
        if (f.storage == V128)
          err(s"type #$i: v128 $what not supported by this engine " +
            "(v128 pool handles cannot live in gc fields)")
      c match {
        case CStruct(fs) => fs.foreach(fieldOk(_, "struct field"))
        case CArray(e) => fieldOk(e, "array element")
        case CFunc(_) => ()
      }
    }
    // wasm-gc declared subtyping (r16): ref.test/ref.cast resolve
    // EXACTLY these chains at runtime, so the declarations must be
    // legal refinements — mutable fields invariant, immutable fields
    // covariant (kind-level for references), function types
    // contravariant in params / covariant in results (GC spec §3.4.7).
    if (m.superTypes.nonEmpty) {
      def stOk(sub: Byte, sup: Byte): Boolean =
        sub == sup || (isRef(sub) && isRef(sup) && subRef(sub, sup))
      def fieldSub(sub: FieldType, sup: FieldType, what: String): Unit =
        if (sup.mutable || sub.mutable) {
          if (!(sup.mutable && sub.mutable && sub.storage == sup.storage))
            err(s"$what: mutable fields are invariant under declared " +
              "subtyping")
        } else if (!stOk(sub.storage, sup.storage))
          err(s"$what: ${tyName(sub.storage)} does not refine " +
            tyName(sup.storage))
      m.superTypes.zipWithIndex.foreach { case (sup, i) =>
        if (sup >= 0) {
          if (sup >= i)
            err(s"type #$i: supertype $sup does not precede it (forward " +
              "supertype references are not supported by this engine)")
          (m.comp(i), m.comp(sup)) match {
            case (CStruct(a), CStruct(b)) =>
              if (a.size < b.size)
                err(s"type #$i: struct declares ${a.size} fields but its " +
                  s"supertype $sup has ${b.size}")
              b.indices.foreach(j =>
                fieldSub(a(j), b(j), s"type #$i field $j"))
            case (CArray(a), CArray(b)) =>
              fieldSub(a, b, s"type #$i element")
            case (CFunc(a), CFunc(b)) =>
              if (a.params.size != b.params.size ||
                  a.results.size != b.results.size)
                err(s"type #$i: function arity differs from supertype $sup")
              a.params.zip(b.params).foreach { case (sp, bp) =>
                if (!stOk(bp, sp))
                  err(s"type #$i: param does not contravary supertype $sup")
              }
              a.results.zip(b.results).foreach { case (sr, br) =>
                if (!stOk(sr, br))
                  err(s"type #$i: result does not covary supertype $sup")
              }
            case _ =>
              err(s"type #$i: declared supertype $sup has a different " +
                "composite kind")
          }
        }
      }
    }
    // EH tier (late r16): a tag's type must be a function type with
    // EMPTY results — the payload signature of throw/catch
    m.tags.zipWithIndex.foreach { case (t, i) =>
      if (t.typeIdx < 0 || t.typeIdx >= nTypes)
        err(s"tag #$i: type index ${t.typeIdx} of $nTypes")
      m.comp(t.typeIdx) match {
        case CFunc(ft) =>
          if (ft.results.nonEmpty)
            err(s"tag #$i: tag type must have empty results")
        case _ => err(s"tag #$i: type index ${t.typeIdx} is not a " +
          "function type")
      }
    }
    if (m.funcTypeIdxs.size != m.codes.size)
      err(s"function section declares ${m.funcTypeIdxs.size} functions " +
        s"but the code section carries ${m.codes.size} bodies")
    m.funcTypeIdxs.zipWithIndex.foreach { case (t, i) =>
      if (t < 0 || t >= nTypes) err(s"function #$i: type index $t of $nTypes")
      if (!isFuncComp(t)) err(s"function #$i: type index $t is not a " +
        "function type")
    }
    val nFuncs = m.imports.size + m.funcTypeIdxs.size
    def funcType(f: Int): FuncType =
      if (f < m.imports.size) m.types(m.imports(f).typeIdx)
      else m.types(m.funcTypeIdxs(f - m.imports.size))

    // Effective tables: a module with elem segments but no table section
    // synthesizes one funcref table (the MVP leniency WasmInterp mirrors).
    val tables: Vector[TableType] =
      if (m.tables.nonEmpty) m.tables
      else if (m.elems.nonEmpty) Vector(TableType(Funcref, 0, None))
      else Vector.empty

    m.globals.zipWithIndex.foreach { case (g, i) =>
      if (isRef(g.valType) && g.valType != Funcref && g.valType != Externref)
        err(s"global #$i: ${tyName(g.valType)} global not supported by " +
          "this engine (the gc arena is reclaimed per invocation)")
      val ok = g.init match {
        case Vector(I32Const(_)) => g.valType == I32
        case Vector(I64Const(_)) => g.valType == I64
        case Vector(F32Const(_)) => g.valType == F32
        case Vector(F64Const(_)) => g.valType == F64
        case Vector(RefNull(ht)) => g.valType == ht.toByte
        case Vector(RefFunc(f)) =>
          g.valType == Funcref && f >= 0 && f < nFuncs
        case _ => false
      }
      if (!ok) err(s"global #$i: init expr does not produce its declared " +
        s"type ${tyName(g.valType)}")
    }

    m.exports.groupBy(_.name).foreach { case (n, es) =>
      if (es.size > 1) err(s"duplicate export name `$n`")
    }
    m.exports.foreach { e =>
      e.kind match {
        case 0 => if (e.idx < 0 || e.idx >= nFuncs)
          err(s"export `${e.name}`: function index ${e.idx} of $nFuncs")
        case 1 => if (e.idx < 0 || e.idx >= tables.size)
          err(s"export `${e.name}`: table index ${e.idx} of ${tables.size}")
        case 2 => if (e.idx != 0)
          err(s"export `${e.name}`: memory index ${e.idx} (single memory)")
        case 3 => if (e.idx < 0 || e.idx >= m.globals.size)
          err(s"export `${e.name}`: global index ${e.idx} of ${m.globals.size}")
        case 4 => if (e.idx < 0 || e.idx >= m.tags.size)
          err(s"export `${e.name}`: tag index ${e.idx} of ${m.tags.size}")
        case k => err(s"export `${e.name}`: unknown export kind $k")
      }
    }

    m.start.foreach { s =>
      if (s < 0 || s >= nFuncs) err(s"start function index $s of $nFuncs")
      val t = funcType(s)
      if (t.params.nonEmpty || t.results.nonEmpty)
        err("start function must have type [] -> []")
    }

    m.elems.zipWithIndex.foreach { case (e, i) =>
      if (e.mode == 0) {
        if (e.tableIdx < 0 || e.tableIdx >= tables.size)
          err(s"elem segment #$i: table index ${e.tableIdx} of ${tables.size}")
        if (tables(e.tableIdx).elemType != e.elemType)
          err(s"elem segment #$i: ${tyName(e.elemType)} segment targets a " +
            s"${tyName(tables(e.tableIdx).elemType)} table")
      }
      e.funcIdxs.foreach { f =>
        // -1 encodes ref.null; anything else must be a live function index
        if (f != -1 && (f < 0 || f >= nFuncs))
          err(s"elem segment #$i: function index $f of $nFuncs")
        if (f != -1 && e.elemType != Funcref)
          err(s"elem segment #$i: ref.func item in a " +
            s"${tyName(e.elemType)} segment")
      }
    }

    m.memMaxPages.foreach { mx =>
      if (mx < m.memMinPages)
        err(s"memory limits: max $mx < min ${m.memMinPages}")
    }
    tables.zipWithIndex.foreach { case (t, i) =>
      t.max.foreach { mx =>
        if (mx < t.min) err(s"table #$i limits: max $mx < min ${t.min}")
      }
    }

    m.codes.zipWithIndex.foreach { case (c, i) =>
      new BodyChecker(m, tables, nFuncs, funcType, c,
        m.imports.size + i).check()
    }
  }

  /** One function body's type-stack walk (spec appendix: validation
   *  algorithm), recursive over the structured AST instead of flat
   *  opcodes — Block/Loop/If push control frames; `unreachable` marks
   *  the frame bottom-polymorphic. */
  private final class BodyChecker(
      m: WasmModule,
      tables: Vector[TableType],
      nFuncs: Int,
      funcType: Int => FuncType,
      code: FuncBody,
      fIdx: Int) {

    private def err(s: String): Nothing =
      throw new WasmValidateError(s"invalid function #$fIdx: $s")

    private val fType: FuncType =
      m.types(m.funcTypeIdxs(fIdx - m.imports.size))
    private val locals: Array[Byte] = (fType.params ++ code.locals).toArray

    /** Address operand type: i64 under memory64 (late r16), else i32. */
    private val addrT: Byte = if (m.mem64) I64 else I32

    private val stack = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private final class Frame(val labelTypes: Vector[Byte],
        val endTypes: Vector[Byte], val height: Int) {
      var unreachable: Boolean = false
    }
    private val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]

    private def push(t: Byte): Unit = stack += t
    private def pushVals(ts: Vector[Byte]): Unit = ts.foreach(push)
    private def pop(): Byte = {
      val f = frames.last
      if (stack.size == f.height) {
        if (f.unreachable) Unknown
        else err("operand stack underflow")
      } else {
        val t = stack.last
        stack.remove(stack.size - 1)
        t
      }
    }
    private def popExpect(e: Byte): Byte = {
      val a = pop()
      // reference positions accept kind-level subtypes (wasm-gc r16):
      // none <: i31/struct/array <: eq <: any, nofunc <: func,
      // noextern <: extern — everything else stays exact-match
      if (a != Unknown && e != Unknown && a != e &&
          !(isRef(a) && isRef(e) && subRef(a, e)))
        err(s"expected ${tyName(e)}, found ${tyName(a)}")
      if (a == Unknown) e else a
    }
    private def popVals(ts: Vector[Byte]): Unit = {
      var i = ts.size - 1
      while (i >= 0) { popExpect(ts(i)); i -= 1 }
    }
    private def pushFrame(label: Vector[Byte], end: Vector[Byte],
        init: Vector[Byte]): Unit = {
      frames += new Frame(label, end, stack.size)
      pushVals(init)
    }
    private def popFrame(): Vector[Byte] = {
      val f = frames.last
      popVals(f.endTypes)
      if (stack.size != f.height)
        err(s"${stack.size - f.height} extra operand(s) at block end")
      frames.remove(frames.size - 1)
      f.endTypes
    }
    private def setUnreachable(): Unit = {
      val f = frames.last
      while (stack.size > f.height) stack.remove(stack.size - 1)
      f.unreachable = true
    }
    private def labelAt(d: Int): Vector[Byte] = {
      if (d < 0 || d >= frames.size)
        err(s"branch depth $d of ${frames.size} labels")
      frames(frames.size - 1 - d).labelTypes
    }

    private def typeAt(idx: Int): FuncType = {
      if (idx < 0 || idx >= m.types.size)
        err(s"type index $idx of ${m.types.size}")
      m.comp(idx) match {
        case CFunc(ft) => ft
        case _ => err(s"type index $idx is not a function type")
      }
    }
    private def structAt(idx: Int): Vector[FieldType] = {
      if (idx < 0 || idx >= m.types.size)
        err(s"type index $idx of ${m.types.size}")
      m.comp(idx) match {
        case CStruct(fs) => fs
        case _ => err(s"type index $idx is not a struct type")
      }
    }
    private def arrayAt(idx: Int): FieldType = {
      if (idx < 0 || idx >= m.types.size)
        err(s"type index $idx of ${m.types.size}")
      m.comp(idx) match {
        case CArray(e) => e
        case _ => err(s"type index $idx is not an array type")
      }
    }
    /** Kind byte of an exact heap type (ref.test/ref.cast/br_on_cast
     *  immediates): concrete indices coarsen to their composite kind,
     *  abstract heap types keep their byte. */
    private def kindOf(ht: Int): Byte =
      if (ht < 0) (~ht).toByte
      else {
        if (ht >= m.types.size)
          err(s"heap type index $ht of ${m.types.size}")
        m.comp(ht) match {
          case CFunc(_) => Funcref
          case CStruct(_) => Structref
          case CArray(_) => Arrayref
        }
      }
    /** The payload signature of an exception tag (EH tier). */
    private def tagSig(t: Int): FuncType = {
      if (t < 0 || t >= m.tags.size)
        err(s"tag index $t of ${m.tags.size}")
      m.types(m.tags(t).typeIdx)
    }
    private def btParams(bt: Int): Vector[Byte] =
      if (bt < 0) typeAt(-1 - bt).params else Vector.empty
    private def btResults(bt: Int): Vector[Byte] =
      if (bt == Empty) Vector.empty
      else if (bt < 0) typeAt(-1 - bt).results
      else Vector(bt.toByte)

    private def tableAt(ti: Int): TableType = {
      if (ti < 0 || ti >= tables.size)
        err(s"table index $ti of ${tables.size}")
      tables(ti)
    }
    private def checkAlign(align: Int, width: Int, what: String): Unit =
      if (align < 0 || align > 30 || (1 << align) > width)
        err(s"$what: alignment 2^$align exceeds width $width")

    def check(): Unit = {
      pushFrame(fType.results, fType.results, Vector.empty)
      checkSeq(code.body)
      popFrame()
      ()
    }

    private def checkSeq(body: Vector[Instr]): Unit = body.foreach(checkInstr)

    private def checkInstr(in: Instr): Unit = in match {
      case Unreachable => setUnreachable()
      case Nop => ()
      case Block(bt, inner) =>
        val ps = btParams(bt); val rs = btResults(bt)
        popVals(ps)
        pushFrame(rs, rs, ps)
        checkSeq(inner)
        pushVals(popFrame())
      case Loop(bt, inner) =>
        val ps = btParams(bt); val rs = btResults(bt)
        popVals(ps)
        pushFrame(ps, rs, ps) // a loop label carries its PARAMS
        checkSeq(inner)
        pushVals(popFrame())
      case If(bt, thn, els) =>
        popExpect(I32)
        val ps = btParams(bt); val rs = btResults(bt)
        popVals(ps)
        pushFrame(rs, rs, ps)
        checkSeq(thn)
        popFrame()
        if (els.nonEmpty) {
          pushFrame(rs, rs, ps)
          checkSeq(els)
          popFrame()
        } else if (ps != rs)
          err("if without else must have identical params and results")
        pushVals(rs)
      case Br(d) =>
        popVals(labelAt(d))
        setUnreachable()
      case BrIf(d) =>
        popExpect(I32)
        val lt = labelAt(d)
        popVals(lt); pushVals(lt)
      case BrTable(targets, default) =>
        popExpect(I32)
        val base = labelAt(default)
        targets.foreach { t =>
          if (labelAt(t) != base)
            err(s"br_table: target $t label types differ from default's")
        }
        popVals(base)
        setUnreachable()
      case Return =>
        popVals(fType.results)
        setUnreachable()
      case Call(f) =>
        if (f < 0 || f >= nFuncs) err(s"call: function index $f of $nFuncs")
        val t = funcType(f)
        popVals(t.params); pushVals(t.results)
      case CallIndirect(typeIdx, tableIdx) =>
        val tt = tableAt(tableIdx)
        if (tt.elemType != Funcref)
          err(s"call_indirect through a ${tyName(tt.elemType)} table")
        val t = typeAt(typeIdx)
        popExpect(I32)
        popVals(t.params); pushVals(t.results)
      case Drop => pop()
      case Select =>
        popExpect(I32)
        val t1 = pop(); val t2 = pop()
        if (isRef(t1) || isRef(t2))
          err("untyped select over a reference type (use typed select)")
        if (t1 != Unknown && t2 != Unknown && t1 != t2)
          err(s"select operand types differ: ${tyName(t2)} vs ${tyName(t1)}")
        push(if (t1 == Unknown) t2 else t1)
      case SelectT(ts) =>
        if (ts.size != 1) err(s"typed select arity ${ts.size} (must be 1)")
        popExpect(I32)
        popExpect(ts(0)); popExpect(ts(0))
        push(ts(0))
      case LocalGet(i) =>
        if (i < 0 || i >= locals.length)
          err(s"local.get: index $i of ${locals.length}")
        push(locals(i))
      case LocalSet(i) =>
        if (i < 0 || i >= locals.length)
          err(s"local.set: index $i of ${locals.length}")
        popExpect(locals(i))
      case LocalTee(i) =>
        if (i < 0 || i >= locals.length)
          err(s"local.tee: index $i of ${locals.length}")
        popExpect(locals(i)); push(locals(i))
      case GlobalGet(i) =>
        if (i < 0 || i >= m.globals.size)
          err(s"global.get: index $i of ${m.globals.size}")
        push(m.globals(i).valType)
      case GlobalSet(i) =>
        if (i < 0 || i >= m.globals.size)
          err(s"global.set: index $i of ${m.globals.size}")
        if (!m.globals(i).mutable) err(s"global.set of immutable global $i")
        popExpect(m.globals(i).valType)
      case RefNull(ht) => push(ht.toByte)
      case RefIsNull =>
        val t = pop()
        if (t != Unknown && !isRef(t))
          err(s"ref.is_null on ${tyName(t)}")
        push(I32)
      case RefFunc(f) =>
        if (f < 0 || f >= nFuncs) err(s"ref.func: index $f of $nFuncs")
        push(Funcref)
      case TableGet(ti) =>
        val tt = tableAt(ti); popExpect(I32); push(tt.elemType)
      case TableSet(ti) =>
        val tt = tableAt(ti); popExpect(tt.elemType); popExpect(I32)
      case TableSize(ti) => tableAt(ti); push(I32)
      case TableGrow(ti) =>
        val tt = tableAt(ti)
        popExpect(I32); popExpect(tt.elemType); push(I32)
      case TableFill(ti) =>
        val tt = tableAt(ti)
        popExpect(I32); popExpect(tt.elemType); popExpect(I32)
      case TableCopy(dt, st) =>
        val d = tableAt(dt); val s = tableAt(st)
        if (d.elemType != s.elemType)
          err(s"table.copy ${tyName(s.elemType)} into ${tyName(d.elemType)}")
        popExpect(I32); popExpect(I32); popExpect(I32)
      case TableInit(ei, ti) =>
        if (ei < 0 || ei >= m.elems.size)
          err(s"table.init: elem segment $ei of ${m.elems.size}")
        val tt = tableAt(ti)
        if (m.elems(ei).elemType != tt.elemType)
          err(s"table.init ${tyName(m.elems(ei).elemType)} segment into a " +
            s"${tyName(tt.elemType)} table")
        popExpect(I32); popExpect(I32); popExpect(I32)
      case ElemDrop(ei) =>
        if (ei < 0 || ei >= m.elems.size)
          err(s"elem.drop: elem segment $ei of ${m.elems.size}")
      case MemLoad(op, align, _) =>
        val (w, t) = loadSig(op)
        checkAlign(align, w, f"load 0x$op%02X")
        popExpect(addrT); push(t)
      case MemStore(op, align, _) =>
        val (w, t) = storeSig(op)
        checkAlign(align, w, f"store 0x$op%02X")
        popExpect(t); popExpect(addrT)
      case MemorySize => push(addrT)
      case MemoryGrow => popExpect(addrT); push(addrT)
      case MemoryCopy | MemoryFill =>
        // memory64: dst and n are i64; fill's value stays i32 but a
        // copy's src is i64 too — fill's middle operand is the value
        popExpect(addrT); popExpect(
          if (in == MemoryCopy) addrT else I32)
        popExpect(addrT)
      case MemoryInit(seg) =>
        if (seg < 0 || seg >= m.datas.size)
          err(s"memory.init: data segment $seg of ${m.datas.size}")
        // for memory64 only the DESTINATION address widens to i64
        popExpect(I32); popExpect(I32); popExpect(addrT)
      case DataDrop(seg) =>
        if (seg < 0 || seg >= m.datas.size)
          err(s"data.drop: data segment $seg of ${m.datas.size}")
      case I32Const(_) => push(I32)
      case I64Const(_) => push(I64)
      case F32Const(_) => push(F32)
      case F64Const(_) => push(F64)
      case Num(op) =>
        val (ps, rs) = numSig(op)
        popVals(ps); pushVals(rs)
      case TruncSat(sub) =>
        popExpect(if (sub == 0 || sub == 1 || sub == 4 || sub == 5) F32 else F64)
        push(if (sub <= 3) I32 else I64)
      case SimdConst(_) => push(V128)
      case SimdShuffle(_) =>
        popExpect(V128); popExpect(V128); push(V128)
      case SimdMem(sub, align, _) =>
        if (m.mem64) err(
          "v128 memory access not supported with memory64 by this engine")
        val w = simdMemWidth(sub)
        checkAlign(align, w, s"simd mem subopcode $sub")
        if (sub == 11) { popExpect(V128); popExpect(I32) }
        else { popExpect(I32); push(V128) }
      case SimdLane(sub, _) => sub match {
        case 21 | 22 | 24 | 25 | 27 => popExpect(V128); push(I32)
        case 29 => popExpect(V128); push(I64)
        case 31 => popExpect(V128); push(F32)
        case 33 => popExpect(V128); push(F64)
        case 23 | 26 | 28 => popExpect(I32); popExpect(V128); push(V128)
        case 30 => popExpect(I64); popExpect(V128); push(V128)
        case 32 => popExpect(F32); popExpect(V128); push(V128)
        case 34 => popExpect(F64); popExpect(V128); push(V128)
        case other => err(s"simd lane subopcode $other")
      }
      case SimdMemLane(sub, align, _, _) =>
        if (m.mem64) err(
          "v128 memory access not supported with memory64 by this engine")
        val w = 1 << ((sub - 84) & 3)
        checkAlign(align, w, s"simd lane-mem subopcode $sub")
        popExpect(V128); popExpect(I32)
        if (sub <= 87) push(V128) // loads; stores (88-91) push nothing
      case SimdOp(sub) =>
        simdOpSig(sub) match {
          case Some((ps, rs)) => popVals(ps); pushVals(rs)
          case None => err(s"unassigned simd128 subopcode $sub")
        }
      case AtomicOp(sub, align, _) =>
        if (m.mem64) err(
          "atomics not supported with memory64 by this engine")
        val (ps, rs, w) = atomicSig(sub)
        // atomics require EXACT natural alignment (threads spec §5.4.9)
        if ((1 << align) != w)
          err(s"atomic subopcode $sub: alignment 2^$align != width $w")
        popVals(ps); pushVals(rs)
      case AtomicFence => ()
      // wasm-gc tier (r16): kind-level reference typing (see ValType
      // .subRef); field/element types are tracked per concrete type
      // through the instruction immediates, so packed-width and
      // mutability discipline stay exact
      case RefEq => popExpect(Eqref); popExpect(Eqref); push(I32)
      case RefI31 => popExpect(I32); push(I31ref)
      case I31Get(_) => popExpect(I31ref); push(I32)
      case StructNew(t) =>
        val fs = structAt(t)
        popVals(fs.map(f => unpacked(f.storage)))
        push(Structref)
      case StructNewDefault(t) =>
        structAt(t).zipWithIndex.foreach { case (f, fi) =>
          if (f.storage == F32 || f.storage == F64 || f.storage == I32 ||
            f.storage == I64 || isPacked(f.storage) || isRef(f.storage)) ()
          else err(s"struct.new_default: field $fi of type $t has no " +
            s"default value (${tyName(f.storage)})")
        }
        push(Structref)
      case StructGet(t, f, sign) =>
        val fs = structAt(t)
        if (f < 0 || f >= fs.size)
          err(s"struct.get: field $f of ${fs.size} in type $t")
        if (isPacked(fs(f).storage) != (sign != 0))
          err(if (sign != 0)
            s"struct.get_${if (sign == 1) "s" else "u"} on an unpacked field"
          else "plain struct.get on a packed field (use _s/_u)")
        popExpect(Structref)
        push(unpacked(fs(f).storage))
      case StructSet(t, f) =>
        val fs = structAt(t)
        if (f < 0 || f >= fs.size)
          err(s"struct.set: field $f of ${fs.size} in type $t")
        if (!fs(f).mutable) err(s"struct.set on immutable field $f of type $t")
        popExpect(unpacked(fs(f).storage))
        popExpect(Structref)
      case ArrayNew(t) =>
        val e = arrayAt(t)
        popExpect(I32); popExpect(unpacked(e.storage))
        push(Arrayref)
      case ArrayNewDefault(t) =>
        val e = arrayAt(t)
        if (!(e.storage == F32 || e.storage == F64 || e.storage == I32 ||
          e.storage == I64 || isPacked(e.storage) || isRef(e.storage)))
          err(s"array.new_default: type $t element has no default value")
        popExpect(I32)
        push(Arrayref)
      case ArrayNewFixed(t, n) =>
        val e = arrayAt(t)
        var j = 0
        while (j < n) { popExpect(unpacked(e.storage)); j += 1 }
        push(Arrayref)
      case ArrayGet(t, sign) =>
        val e = arrayAt(t)
        if (isPacked(e.storage) != (sign != 0))
          err(if (sign != 0)
            s"array.get_${if (sign == 1) "s" else "u"} on an unpacked array"
          else "plain array.get on a packed array (use _s/_u)")
        popExpect(I32); popExpect(Arrayref)
        push(unpacked(e.storage))
      case ArraySet(t) =>
        val e = arrayAt(t)
        if (!e.mutable) err(s"array.set on immutable array type $t")
        popExpect(unpacked(e.storage)); popExpect(I32); popExpect(Arrayref)
      case ArrayLen => popExpect(Arrayref); push(I32)
      case ArrayFill(t) =>
        val e = arrayAt(t)
        if (!e.mutable) err(s"array.fill on immutable array type $t")
        popExpect(I32); popExpect(unpacked(e.storage)); popExpect(I32)
        popExpect(Arrayref)
      case ArrayCopy(dt, st) =>
        val d = arrayAt(dt); val s = arrayAt(st)
        if (!d.mutable) err(s"array.copy into immutable array type $dt")
        if (d.storage != s.storage)
          err(s"array.copy ${tyName(s.storage)} elements into " +
            s"${tyName(d.storage)} (storage types must match)")
        popExpect(I32); popExpect(I32); popExpect(Arrayref)
        popExpect(I32); popExpect(Arrayref)
      // exception-handling tier (late r16): tags + try_table + throw.
      // Catch labels resolve in the context ENCLOSING the try_table
      // (checked BEFORE its frame is pushed — the spec's rule).
      case Throw(t) =>
        popVals(tagSig(t).params)
        setUnreachable()
      case ThrowRef =>
        popExpect(Exnref)
        setUnreachable()
      case TryTable(bt, catches, inner) =>
        catches.foreach { c =>
          val lt = labelAt(c.label)
          def want(ts: Vector[Byte], what: String): Unit =
            if (lt.size != ts.size || !lt.zip(ts).forall { case (l, v) =>
                l == v || (isRef(l) && isRef(v) && subRef(v, l)) })
              err(s"try_table: $what target label " +
                s"[${lt.map(tyName).mkString(" ")}] does not accept " +
                s"[${ts.map(tyName).mkString(" ")}]")
          c match {
            case CatchTag(t, _) => want(tagSig(t).params, "catch")
            case CatchTagRef(t, _) =>
              want(tagSig(t).params :+ Exnref, "catch_ref")
            case CatchAll(_) => want(Vector.empty, "catch_all")
            case CatchAllRef(_) => want(Vector(Exnref), "catch_all_ref")
          }
        }
        val ps = btParams(bt); val rs = btResults(bt)
        popVals(ps)
        pushFrame(rs, rs, ps)
        checkSeq(inner)
        pushVals(popFrame())
      // function-references tier (late r16): typed-ref calls, TAIL
      // calls (callee results must be the caller's — the frame is
      // discarded), and the null-branch forms
      case CallRef(t) =>
        val ft = typeAt(t)
        popExpect(Funcref)
        popVals(ft.params); pushVals(ft.results)
      case ReturnCall(f) =>
        if (f < 0 || f >= nFuncs)
          err(s"return_call: function index $f of $nFuncs")
        val t = funcType(f)
        if (t.results != fType.results)
          err("return_call: callee result types differ from the caller's")
        popVals(t.params)
        setUnreachable()
      case ReturnCallIndirect(ti, tbl) =>
        val tt = tableAt(tbl)
        if (tt.elemType != Funcref)
          err(s"return_call_indirect through a ${tyName(tt.elemType)} table")
        popExpect(I32)
        val t = typeAt(ti)
        if (t.results != fType.results)
          err("return_call_indirect: callee result types differ from " +
            "the caller's")
        popVals(t.params)
        setUnreachable()
      case ReturnCallRef(ti) =>
        popExpect(Funcref)
        val t = typeAt(ti)
        if (t.results != fType.results)
          err("return_call_ref: callee result types differ from the " +
            "caller's")
        popVals(t.params)
        setUnreachable()
      case RefAsNonNull =>
        val a = pop()
        if (a != Unknown && !isRef(a))
          err(s"ref.as_non_null on ${tyName(a)}")
        push(a)
      case BrOnNull(d) =>
        val a = pop()
        if (a != Unknown && !isRef(a))
          err(s"br_on_null on ${tyName(a)}")
        val lt = labelAt(d)
        popVals(lt); pushVals(lt) // the branch goes WITHOUT the ref
        push(a) // the fallthrough keeps it
      case BrOnNonNull(d) =>
        val a = pop()
        if (a != Unknown && !isRef(a))
          err(s"br_on_non_null on ${tyName(a)}")
        val lt = labelAt(d)
        if (lt.isEmpty || !isRef(lt.last))
          err("br_on_non_null: target label does not expect a " +
            "reference value")
        push(if (a == Unknown) lt.last else a)
        popVals(lt); pushVals(lt)
        pop() // the ref travels with the branch; the fallthrough drops it
      // wasm-gc casts + segment-seeded arrays (r16). Tests and casts
      // validate at KIND level like every reference position; the
      // runtime test on a concrete immediate is precise (declared
      // chains), which only ever REFINES what validation admitted.
      case RefTest(ht, _) =>
        popExpect(hierTop(kindOf(ht))); push(I32)
      case RefCast(ht, _) =>
        val k = kindOf(ht)
        popExpect(hierTop(k)); push(k)
      case BrOnCast(d, srcHt, _, dstHt, _, onFail) =>
        val srcK = kindOf(srcHt); val dstK = kindOf(dstHt)
        if (hierTop(srcK) != hierTop(dstK))
          err("br_on_cast: source and target heap types live in " +
            "different hierarchies")
        if (!(dstK == srcK || subRef(dstK, srcK)))
          err(s"br_on_cast: target ${tyName(dstK)} is not a subtype of " +
            s"source ${tyName(srcK)}")
        popExpect(srcK)
        // taken path: the label receives the (cast or original) value
        val sent = if (onFail) srcK else dstK
        push(sent)
        val lt = labelAt(d)
        if (lt.isEmpty || !isRef(lt.last))
          err("br_on_cast: target label does not expect a reference value")
        popVals(lt); pushVals(lt)
        pop() // the sent value travels with the branch...
        push(if (onFail) dstK else srcK) // ...fallthrough keeps the other
      case AnyConvertExtern => popExpect(Externref); push(Anyref)
      case ExternConvertAny => popExpect(Anyref); push(Externref)
      case ArrayNewData(t, d) =>
        val e = arrayAt(t)
        if (isRef(e.storage))
          err(s"array.new_data: array type $t has reference elements " +
            "(use array.new_elem)")
        if (d < 0 || d >= m.datas.size)
          err(s"array.new_data: data segment $d of ${m.datas.size}")
        popExpect(I32); popExpect(I32); push(Arrayref)
      case ArrayNewElem(t, ei) =>
        val e = arrayAt(t)
        if (!isRef(e.storage))
          err(s"array.new_elem: array type $t has numeric elements " +
            "(use array.new_data)")
        if (ei < 0 || ei >= m.elems.size)
          err(s"array.new_elem: elem segment $ei of ${m.elems.size}")
        val st = m.elems(ei).elemType
        if (!(st == e.storage || subRef(st, e.storage)))
          err(s"array.new_elem: ${tyName(st)} segment into a " +
            s"${tyName(e.storage)} array")
        popExpect(I32); popExpect(I32); push(Arrayref)
      case ArrayInitData(t, d) =>
        val e = arrayAt(t)
        if (!e.mutable) err(s"array.init_data into immutable array type $t")
        if (isRef(e.storage))
          err(s"array.init_data: array type $t has reference elements " +
            "(use array.init_elem)")
        if (d < 0 || d >= m.datas.size)
          err(s"array.init_data: data segment $d of ${m.datas.size}")
        popExpect(I32); popExpect(I32); popExpect(I32); popExpect(Arrayref)
      case ArrayInitElem(t, ei) =>
        val e = arrayAt(t)
        if (!e.mutable) err(s"array.init_elem into immutable array type $t")
        if (!isRef(e.storage))
          err(s"array.init_elem: array type $t has numeric elements " +
            "(use array.init_data)")
        if (ei < 0 || ei >= m.elems.size)
          err(s"array.init_elem: elem segment $ei of ${m.elems.size}")
        val st = m.elems(ei).elemType
        if (!(st == e.storage || subRef(st, e.storage)))
          err(s"array.init_elem: ${tyName(st)} segment into a " +
            s"${tyName(e.storage)} array")
        popExpect(I32); popExpect(I32); popExpect(I32); popExpect(Arrayref)
    }

    /** (width, result type) for MemLoad ops 0x28-0x35. */
    private def loadSig(op: Int): (Int, Byte) = op match {
      case 0x28 => (4, I32)
      case 0x29 => (8, I64)
      case 0x2A => (4, F32)
      case 0x2B => (8, F64)
      case 0x2C | 0x2D => (1, I32)
      case 0x2E | 0x2F => (2, I32)
      case 0x30 | 0x31 => (1, I64)
      case 0x32 | 0x33 => (2, I64)
      case 0x34 | 0x35 => (4, I64)
      case other => err(f"load opcode 0x$other%02X")
    }

    /** (width, value type) for MemStore ops 0x36-0x3E. */
    private def storeSig(op: Int): (Int, Byte) = op match {
      case 0x36 => (4, I32)
      case 0x37 => (8, I64)
      case 0x38 => (4, F32)
      case 0x39 => (8, F64)
      case 0x3A => (1, I32)
      case 0x3B => (2, I32)
      case 0x3C => (1, I64)
      case 0x3D => (2, I64)
      case 0x3E => (4, I64)
      case other => err(f"store opcode 0x$other%02X")
    }

    /** Access width for SimdMem subopcodes (loads 0-10, store 11,
     *  load_zero 92/93). */
    private def simdMemWidth(sub: Int): Int = sub match {
      case 0 | 11 => 16
      case ext if ext >= 1 && ext <= 6 => 8
      case spl if spl >= 7 && spl <= 10 => 1 << (spl - 7)
      case 92 => 4
      case 93 => 8
      case other => err(s"simd mem subopcode $other")
    }

    /** i32/i64 per position-in-family k (i32, i64, 32_8u, 32_16u,
     *  64_8u, 64_16u, 64_32u) — mirrors WasmInterp.atomicWidth. */
    private def atomTy(k: Int): Byte =
      if (k == 0 || k == 2 || k == 3) I32 else I64
    private def atomW(k: Int): Int = k match {
      case 0 | 6 => 4
      case 1 => 8
      case 2 | 4 => 1
      case _ => 2
    }

    /** (params, results, width) for AtomicOp subopcodes. */
    private def atomicSig(sub: Int): (Vector[Byte], Vector[Byte], Int) =
      sub match {
        case 0x00 => (Vector(I32, I32), Vector(I32), 4) // notify
        case 0x01 => (Vector(I32, I32, I64), Vector(I32), 4) // wait32
        case 0x02 => (Vector(I32, I64, I64), Vector(I32), 8) // wait64
        case l if l >= 0x10 && l <= 0x16 =>
          val k = l - 0x10
          (Vector(I32), Vector(atomTy(k)), atomW(k))
        case s if s >= 0x17 && s <= 0x1D =>
          val k = s - 0x17
          (Vector(I32, atomTy(k)), Vector.empty, atomW(k))
        case r if r >= 0x1E && r <= 0x47 =>
          val k = (r - 0x1E) % 7
          (Vector(I32, atomTy(k)), Vector(atomTy(k)), atomW(k))
        case c if c >= 0x48 && c <= 0x4E =>
          val k = c - 0x48
          (Vector(I32, atomTy(k), atomTy(k)), Vector(atomTy(k)), atomW(k))
        case other => err(f"atomic subopcode 0x$other%02X")
      }

    /** (params, results) for every Num opcode 0x45-0xC4 (decode
     *  guarantees the range). */
    private def numSig(op: Int): (Vector[Byte], Vector[Byte]) = op match {
      case 0x45 => (Vector(I32), Vector(I32))
      case c if c >= 0x46 && c <= 0x4F => (Vector(I32, I32), Vector(I32))
      case 0x50 => (Vector(I64), Vector(I32))
      case c if c >= 0x51 && c <= 0x5A => (Vector(I64, I64), Vector(I32))
      case c if c >= 0x5B && c <= 0x60 => (Vector(F32, F32), Vector(I32))
      case c if c >= 0x61 && c <= 0x66 => (Vector(F64, F64), Vector(I32))
      case c if c >= 0x67 && c <= 0x69 => (Vector(I32), Vector(I32))
      case c if c >= 0x6A && c <= 0x78 => (Vector(I32, I32), Vector(I32))
      case c if c >= 0x79 && c <= 0x7B => (Vector(I64), Vector(I64))
      case c if c >= 0x7C && c <= 0x8A => (Vector(I64, I64), Vector(I64))
      case c if c >= 0x8B && c <= 0x91 => (Vector(F32), Vector(F32))
      case c if c >= 0x92 && c <= 0x98 => (Vector(F32, F32), Vector(F32))
      case c if c >= 0x99 && c <= 0x9F => (Vector(F64), Vector(F64))
      case c if c >= 0xA0 && c <= 0xA6 => (Vector(F64, F64), Vector(F64))
      case 0xA7 => (Vector(I64), Vector(I32))
      case 0xA8 | 0xA9 => (Vector(F32), Vector(I32))
      case 0xAA | 0xAB => (Vector(F64), Vector(I32))
      case 0xAC | 0xAD => (Vector(I32), Vector(I64))
      case 0xAE | 0xAF => (Vector(F32), Vector(I64))
      case 0xB0 | 0xB1 => (Vector(F64), Vector(I64))
      case 0xB2 | 0xB3 => (Vector(I32), Vector(F32))
      case 0xB4 | 0xB5 => (Vector(I64), Vector(F32))
      case 0xB6 => (Vector(F64), Vector(F32))
      case 0xB7 | 0xB8 => (Vector(I32), Vector(F64))
      case 0xB9 | 0xBA => (Vector(I64), Vector(F64))
      case 0xBB => (Vector(F32), Vector(F64))
      case 0xBC => (Vector(F32), Vector(I32))
      case 0xBD => (Vector(F64), Vector(I64))
      case 0xBE => (Vector(I32), Vector(F32))
      case 0xBF => (Vector(I64), Vector(F64))
      case 0xC0 | 0xC1 => (Vector(I32), Vector(I32))
      case c if c >= 0xC2 && c <= 0xC4 => (Vector(I64), Vector(I64))
      case other => err(f"numeric opcode 0x$other%02X")
    }

    /** (params, results) for SimdOp subopcodes the evaluator assigns
     *  (plain simd128 + relaxed-simd 0x100-0x113); None = unassigned. */
    private def simdOpSig(sub: Int): Option[(Vector[Byte], Vector[Byte])] = {
      val v1 = Vector(V128)
      val v2 = Vector(V128, V128)
      val v3 = Vector(V128, V128, V128)
      val shift = Vector(V128, I32)
      val rV = Vector(V128)
      val rI = Vector(I32)
      sub match {
        case 14 => Some(v2 -> rV) // swizzle
        case 15 | 16 | 17 => Some(Vector(I32) -> rV) // i8/i16/i32 splat
        case 18 => Some(Vector(I64) -> rV)
        case 19 => Some(Vector(F32) -> rV)
        case 20 => Some(Vector(F64) -> rV)
        case c if c >= 35 && c <= 76 => Some(v2 -> rV) // comparisons
        case 77 => Some(v1 -> rV) // not
        case c if c >= 78 && c <= 81 => Some(v2 -> rV) // and/andnot/or/xor
        case 82 => Some(v3 -> rV) // bitselect
        case 83 => Some(v1 -> rI) // any_true
        case 94 | 95 => Some(v1 -> rV) // demote/promote
        case 96 | 97 | 98 => Some(v1 -> rV) // i8x16 abs/neg/popcnt
        case 99 | 100 => Some(v1 -> rI) // all_true/bitmask
        case 101 | 102 => Some(v2 -> rV) // narrow
        case c if c >= 103 && c <= 106 => Some(v1 -> rV) // f32x4 rounding
        case 107 | 108 | 109 => Some(shift -> rV)
        case c if c >= 110 && c <= 115 => Some(v2 -> rV) // add/sub (sat)
        case 116 | 117 => Some(v1 -> rV) // f64x2 ceil/floor
        case c if c >= 118 && c <= 121 => Some(v2 -> rV) // min/max
        case 122 => Some(v1 -> rV) // f64x2 trunc
        case 123 => Some(v2 -> rV) // avgr
        case c if c >= 124 && c <= 127 => Some(v1 -> rV) // extadd_pairwise
        case 128 | 129 => Some(v1 -> rV) // i16x8 abs/neg
        case 130 => Some(v2 -> rV) // q15mulr_sat
        case 131 | 132 => Some(v1 -> rI)
        case 133 | 134 => Some(v2 -> rV)
        case c if c >= 135 && c <= 138 => Some(v1 -> rV) // extend
        case 139 | 140 | 141 => Some(shift -> rV)
        case c if c >= 142 && c <= 147 => Some(v2 -> rV)
        case 148 => Some(v1 -> rV) // f64x2 nearest
        case c if c >= 149 && c <= 153 => Some(v2 -> rV)
        case 155 => Some(v2 -> rV)
        case c if c >= 156 && c <= 159 => Some(v2 -> rV) // extmul
        case 160 | 161 => Some(v1 -> rV) // i32x4 abs/neg
        case 163 | 164 => Some(v1 -> rI)
        case c if c >= 167 && c <= 170 => Some(v1 -> rV)
        case 171 | 172 | 173 => Some(shift -> rV)
        case 174 | 177 | 181 => Some(v2 -> rV)
        case c if c >= 182 && c <= 186 => Some(v2 -> rV) // min/max/dot
        case c if c >= 188 && c <= 191 => Some(v2 -> rV)
        case 192 | 193 => Some(v1 -> rV) // i64x2 abs/neg
        case 195 | 196 => Some(v1 -> rI)
        case c if c >= 199 && c <= 202 => Some(v1 -> rV)
        case 203 | 204 | 205 => Some(shift -> rV)
        case 206 | 209 | 213 => Some(v2 -> rV)
        case c if c >= 214 && c <= 223 => Some(v2 -> rV) // cmp + extmul
        case 224 | 225 | 227 => Some(v1 -> rV) // f32x4 abs/neg/sqrt
        case c if c >= 228 && c <= 235 => Some(v2 -> rV)
        case 236 | 237 | 239 => Some(v1 -> rV) // f64x2 abs/neg/sqrt
        case c if c >= 240 && c <= 247 => Some(v2 -> rV)
        case c if c >= 248 && c <= 255 => Some(v1 -> rV) // conversions
        case 0x100 => Some(v2 -> rV) // relaxed swizzle
        case c if c >= 0x101 && c <= 0x104 => Some(v1 -> rV) // relaxed trunc
        case c if c >= 0x105 && c <= 0x10C => Some(v3 -> rV) // madd/laneselect
        case c if c >= 0x10D && c <= 0x112 => Some(v2 -> rV) // min/max/mulr/dot
        case 0x113 => Some(v3 -> rV) // dot_add
        case _ => None
      }
    }
  }
}
