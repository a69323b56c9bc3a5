package graft

import graft.ops.WasmGuest
import graft.wasm._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.charset.StandardCharsets.UTF_8

/** The WASM runtime itself: binary codec round-trip, core evaluator
 *  semantics, and the lens guest modules driven through the real ABI
 *  (alloc/transform/next/set_param/inverse over linear memory). */
class WasmSpec extends AnyFunSuite with Matchers {

  // ---------- binary codec ----------

  test("encode/decode round-trips every guest module bit-exactly") {
    for (bytes <- Seq(LensGuestModules.shiftGuest("value"),
        LensGuestModules.filterGuest("value"),
        LensGuestModules.repeatGuest())) {
      assert(WasmBinary.isWasm(bytes))
      val m = WasmBinary.decode(bytes)
      val re = WasmBinary.encode(m)
      assert(re.sameElements(bytes), "encode(decode(bytes)) != bytes")
      WasmBinary.decode(re) shouldBe m
    }
  }

  test("codec round-trip property over random modules (LEB128 edges included)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val intEdges = Gen.oneOf(0, 1, -1, 63, 64, -64, -65, 127, 128,
      Int.MaxValue, Int.MinValue)
    val longEdges = Gen.oneOf(0L, -1L, 63L, -64L, -65L, 8191L,
      Long.MaxValue, Long.MinValue)
    val leaf: Gen[Instr] = Gen.oneOf(
      intEdges.map(I32Const.apply), longEdges.map(I64Const.apply),
      intEdges.map(F32Const.apply), longEdges.map(F64Const.apply),
      Gen.choose(0, 10).map(LocalGet.apply), Gen.choose(0, 10).map(LocalSet.apply),
      Gen.choose(0, 3).map(GlobalGet.apply), Gen.choose(0, 3).map(GlobalSet.apply),
      Gen.choose(0, 3).map(Br.apply), Gen.choose(0, 3).map(BrIf.apply),
      Gen.choose(0, 7).map(Call.apply),
      for { t <- Gen.choose(0, 6); tb <- Gen.choose(0, 2) }
        yield CallIndirect(t, tb),
      // reference-types instructions
      Gen.oneOf(0x70, 0x6F).map(RefNull.apply),
      Gen.const(RefIsNull: Instr), Gen.choose(0, 7).map(RefFunc.apply),
      Gen.choose(0, 2).map(TableGet.apply), Gen.choose(0, 2).map(TableSet.apply),
      Gen.choose(0, 2).map(TableGrow.apply), Gen.choose(0, 2).map(TableSize.apply),
      Gen.choose(0, 2).map(TableFill.apply),
      for { d <- Gen.choose(0, 2); s <- Gen.choose(0, 2) } yield TableCopy(d, s),
      for { e <- Gen.choose(0, 3); t <- Gen.choose(0, 2) } yield TableInit(e, t),
      Gen.choose(0, 3).map(ElemDrop.apply),
      Gen.oneOf(ValType.I32, ValType.Funcref, ValType.Externref)
        .map(vt => SelectT(Vector(vt))),
      // atomics (threads tier): every subopcode family + fence
      for {
        sub <- Gen.oneOf(Gen.choose(0, 2), Gen.choose(0x10, 0x4E))
        a <- Gen.choose(0, 3); o <- Gen.choose(0, 1 << 20)
      } yield AtomicOp(sub, a, o),
      Gen.const(AtomicFence: Instr),
      // relaxed-simd subopcodes ride SimdOp's >255 LEB encoding
      Gen.choose(0x100, 0x113).map(SimdOp.apply),
      for { op <- Gen.choose(0x28, 0x35); a <- Gen.choose(0, 3);
            o <- Gen.choose(0, 1 << 20) } yield MemLoad(op, a, o),
      for { op <- Gen.choose(0x36, 0x3E); a <- Gen.choose(0, 3);
            o <- Gen.choose(0, 1 << 20) } yield MemStore(op, a, o),
      Gen.choose(0x45, 0xC4).map(Num.apply),
      Gen.oneOf(Seq[Instr](Nop, Drop, Select, Return, Unreachable,
        MemorySize, MemoryGrow, MemoryCopy, MemoryFill)),
      Gen.choose(0, 5).map(MemoryInit.apply),
      Gen.choose(0, 5).map(DataDrop.apply),
      Gen.listOfN(3, Gen.choose(0, 3)).map(ts => BrTable(ts.toVector, 0)))
    def instr(depth: Int): Gen[Instr] =
      if (depth == 0) leaf
      else Gen.frequency(
        6 -> leaf,
        1 -> Gen.listOfN(3, instr(depth - 1)).map(b => Block(0x40, b.toVector)),
        1 -> Gen.listOfN(3, instr(depth - 1)).map(b => Loop(0x7F, b.toVector)),
        // multi-value blocktype (func-type index, stored -1 - idx; index
        // 70 forces the multi-byte s33 encoding)
        1 -> (for { b <- Gen.listOfN(2, instr(depth - 1));
                    ti <- Gen.oneOf(0, 1, 63, 64, 70) }
              yield Block(-1 - ti, b.toVector)),
        1 -> (for { t <- Gen.listOfN(2, instr(depth - 1));
                    e <- Gen.listOfN(2, instr(depth - 1)) }
              yield If(0x40, t.toVector, e.toVector)),
        1 -> Gen.listOfN(2, instr(depth - 1)).map(b => If(0x7E, b.toVector, Vector())))
    val moduleGen: Gen[WasmModule] = for {
      body <- Gen.listOfN(12, instr(2))
      locals <- Gen.listOf(Gen.oneOf(ValType.I32, ValType.I64, ValType.F32, ValType.F64))
      nGlobals <- Gen.choose(0, 3)
      data <- Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
      tbl <- Gen.choose(0, 4)
    } yield WasmModule(
      types = Vector(FuncType(Vector(ValType.I32), Vector(ValType.I64))),
      imports = Vector(WasmImport("env", "host", 0)),
      funcTypeIdxs = Vector(0),
      memMinPages = 1, memMaxPages = None,
      globals = Vector.fill(nGlobals)(
        WasmGlobal(ValType.I64, mutable = true, Vector(I64Const(7L)))),
      exports = Vector(WasmExport("f", 0, 1), WasmExport("memory", 2, 0)),
      codes = Vector(FuncBody(locals.toVector, body.toVector)),
      datas = if (data.isEmpty) Vector.empty
        else Vector(DataSeg(64, data.toVector),
          DataSeg(-1, data.toVector, passive = true)),
      start = None,
      tables = if (tbl == 0) Vector.empty
        else Vector(TableType(ValType.Funcref, tbl, None),
          TableType(ValType.Externref, 1, Some(8))),
      elems = if (tbl == 0) Vector.empty
        else Vector(
          ElemSeg(0, Vector.fill(tbl)(1)),                       // flag 0
          ElemSeg(-1, Vector(1, -1), mode = 1),                  // 5 (nulls)
          ElemSeg(-1, Vector(1), mode = 1),                      // 1
          ElemSeg(-1, Vector(-1), mode = 2, elemType = 0x6F.toByte), // 7
          ElemSeg(-1, Vector(1, 1), mode = 2),                   // 3
          ElemSeg(0, Vector(1), tableIdx = 1),                   // 2
          ElemSeg(0, Vector(-1), tableIdx = 1,
            elemType = 0x6F.toByte)))                            // 6
    (1 to 60).foreach { i =>
      val m = moduleGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val decoded = WasmBinary.decode(WasmBinary.encode(m))
      withClue(s"seed $i") { decoded shouldBe m }
    }
  }

  // ---------- evaluator core ----------

  private def run1(m: WasmModule, fn: String, args: Long*): Long =
    new WasmInterp.Instance(m, Map.empty).invoke(fn, args: _*).head

  private def func(params: Vector[Byte], results: Vector[Byte],
      locals: Vector[Byte], body: Instr*): WasmModule =
    WasmModule(
      types = Vector(FuncType(params, results)),
      imports = Vector.empty,
      funcTypeIdxs = Vector(0),
      memMinPages = 1, memMaxPages = None,
      globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(locals, body.toVector)),
      datas = Vector.empty, start = None)

  test("iterative factorial: loop + br_if + locals + i64 mul") {
    // f(n: i64) -> i64; locals: 1=acc
    val m = func(Vector(ValType.I64), Vector(ValType.I64), Vector(ValType.I64),
      I64Const(1), LocalSet(1),
      Block(ValType.Empty, Vector(
        Loop(ValType.Empty, Vector(
          LocalGet(0), I64Const(1), Num(0x57), BrIf(1), // n <= 1 -> exit
          LocalGet(1), LocalGet(0), Num(0x7E), LocalSet(1), // acc *= n
          LocalGet(0), I64Const(1), Num(0x7D), LocalSet(0), // n -= 1
          Br(0))))),
      LocalGet(1))
    run1(m, "f", 10L) shouldBe 3628800L
    run1(m, "f", 1L) shouldBe 1L
    run1(m, "f", 20L) shouldBe 2432902008176640000L
  }

  test("branching out of nested blocks unwinds the operand stack to label arity") {
    // f() -> i32: a block with result i32 left via br with junk on the stack
    val m = func(Vector(), Vector(ValType.I32), Vector(),
      Block(ValType.I32, Vector(
        I32Const(111), // junk that must be discarded on branch
        I32Const(42), // the branch result
        Br(0),
        Unreachable)),
      I32Const(1), Num(0x6A)) // +1 => 43
    run1(m, "f") shouldBe 43L
  }

  test("branch arity: an arity-0 block between a value-carrying br and its " +
      "arity-1 target must not swallow the value") {
    // Regression: intermediate labels crossed by an outward br must leave
    // the stack alone — only the TARGET unwinds to its own arity. An
    // implementation that truncates at each crossed label with ITS arity
    // drops the 42 here.
    val m = func(Vector(), Vector(ValType.I32), Vector(),
      Block(ValType.I32, Vector(
        Block(ValType.Empty, Vector(
          I32Const(42),
          Br(1))), // carries 42 out of the OUTER (arity-1) block
        I32Const(7)))) // only on fall-through, which br skips
    run1(m, "f") shouldBe 42L
  }

  // ---------- multi-value (blocktype = function-type index) ----------

  test("multi-value block: two results flow out and fold") {
    // types: 0 = f's ()->i32; 1 = the block's ()->(i32,i32)
    val m = WasmModule(
      types = Vector(
        FuncType(Vector(), Vector(ValType.I32)),
        FuncType(Vector(), Vector(ValType.I32, ValType.I32))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 0, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(), Vector(
        Block(-1 - 1, Vector(I32Const(30), I32Const(12))),
        Num(0x6A)))), // i32.add -> 42
      datas = Vector.empty, start = None)
    val decoded = WasmBinary.decode(WasmBinary.encode(m))
    decoded shouldBe m
    run1(decoded, "f") shouldBe 42L
  }

  test("multi-value block params: the block consumes operands from the stack") {
    // block type (i32, i32) -> (i32): i32.sub inside consumes the params
    val m = WasmModule(
      types = Vector(
        FuncType(Vector(), Vector(ValType.I32)),
        FuncType(Vector(ValType.I32, ValType.I32), Vector(ValType.I32))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 0, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(), Vector(
        I32Const(50), I32Const(8),
        Block(-1 - 1, Vector(Num(0x6B)))))), // i32.sub -> 42
      datas = Vector.empty, start = None)
    run1(m, "f") shouldBe 42L
  }

  test("multi-value loop params: br to the loop label re-enters with carried values") {
    // f(n) = sum 1..n, state (acc, i) carried as LOOP PARAMS through br:
    // locals 0=n (param), 1=i scratch, 2=acc scratch
    val lt = 1 // (i32, i32) -> (i32)
    val m = WasmModule(
      types = Vector(
        FuncType(Vector(ValType.I32), Vector(ValType.I32)),
        FuncType(Vector(ValType.I32, ValType.I32), Vector(ValType.I32))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 0, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(ValType.I32, ValType.I32), Vector(
        I32Const(0), LocalGet(0), // acc = 0, i = n
        Block(-1 - lt, Vector(
          Loop(-1 - lt, Vector(
            LocalSet(1), // i
            LocalSet(2), // acc
            LocalGet(1), Num(0x45), // i == 0 ?
            If(ValType.I32, Vector(
              LocalGet(2)), // done: loop result = acc
              Vector(
                LocalGet(2), LocalGet(1), Num(0x6A), // acc + i
                LocalGet(1), I32Const(1), Num(0x6B), // i - 1
                Br(1)))))))))), // re-enter the LOOP (label 1 from inside the If) with (acc', i')
      datas = Vector.empty, start = None)
    run1(m, "f", 10L) shouldBe 55L
    run1(m, "f", 0L) shouldBe 0L
    run1(m, "f", 1L) shouldBe 1L
  }

  test("multi-value function results: invoke returns them all, in order") {
    val m = WasmModule(
      types = Vector(FuncType(Vector(ValType.I32), Vector(ValType.I32, ValType.I32))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 0, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("divmod7", 0, 0)),
      codes = Vector(FuncBody(Vector(), Vector(
        LocalGet(0), I32Const(7), Num(0x6D), // i32.div_s
        LocalGet(0), I32Const(7), Num(0x6F)))), // i32.rem_s
      datas = Vector.empty, start = None)
    new WasmInterp.Instance(m, Map.empty)
      .invoke("divmod7", 45L) shouldBe Vector(6L, 3L)
  }

  // ---------- bulk memory: passive segments ----------

  test("memory.init copies from a passive segment; data.drop empties it") {
    // passive segment "graft!"; f: init mem[100..104) from seg[1..5),
    // read back as i32 ("raft" LE), then drop and re-init len 0 (ok).
    val seg = "graft!".getBytes(UTF_8).toVector
    def mk(afterDrop: Vector[Instr]) = WasmModule(
      types = Vector(FuncType(Vector(), Vector(ValType.I32))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 1, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(), Vector(
        I32Const(100), I32Const(1), I32Const(4), MemoryInit(0),
        DataDrop(0)) ++ afterDrop ++ Vector(
        I32Const(100), MemLoad(0x28, 2, 0)))),
      datas = Vector(DataSeg(-1, seg, passive = true)), start = None)
    // round-trips through the binary format (flag-1 segment + datacount)
    val ok = WasmBinary.decode(WasmBinary.encode(
      mk(Vector(I32Const(0), I32Const(0), I32Const(0), MemoryInit(0)))))
    val expected = ByteBufferLE("raft".getBytes(UTF_8))
    run1(ok, "f") shouldBe expected
    // a dropped segment behaves as size 0: len > 0 traps, len 0 succeeds
    val trap = mk(Vector(I32Const(0), I32Const(0), I32Const(1), MemoryInit(0)))
    a[WasmTrap] should be thrownBy run1(trap, "f")
    // source range beyond the live segment traps too
    val oob = func(Vector(), Vector(ValType.I32), Vector(),
      I32Const(0), I32Const(0), I32Const(99), MemoryInit(0), I32Const(1))
      .copy(datas = Vector(DataSeg(-1, seg, passive = true)))
    a[WasmTrap] should be thrownBy run1(oob, "f")
  }

  private def ByteBufferLE(b: Array[Byte]): Long =
    ((b(0) & 0xFFL)) | ((b(1) & 0xFFL) << 8) | ((b(2) & 0xFFL) << 16) |
      ((b(3) & 0xFFL) << 24)

  test("memory load/store widths, sign extension, grow, copy, fill") {
    val m = WasmModule(
      types = Vector(FuncType(Vector(), Vector(ValType.I64))),
      imports = Vector.empty,
      funcTypeIdxs = Vector(0),
      memMinPages = 1, memMaxPages = None,
      globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(), Vector(
        // store 0xFF at 10; load8_s => -1; load8_u => 255; sum as i64 => 254
        I32Const(10), I32Const(0xFF), MemStore(0x3A, 0, 0),
        I32Const(10), MemLoad(0x2C, 0, 0), Num(0xAC), // -1 as i64
        I32Const(10), MemLoad(0x2D, 0, 0), Num(0xAC), // 255
        Num(0x7C), // -1 + 255 = 254
        // memory.grow by 1 page returns old size 1; fold it in: 254 + 1
        I32Const(1), MemoryGrow, Num(0xAC), Num(0x7C),
        // copy the byte at 10 to 70000 (only valid after grow) and read it
        I32Const(70000), I32Const(10), I32Const(1), MemoryCopy,
        I32Const(70000), MemLoad(0x2D, 0, 0), Num(0xAC), Num(0x7C), // +255
        // fill 4 bytes of 0x01 at 20, i32.load => 0x01010101
        I32Const(20), I32Const(1), I32Const(4), MemoryFill,
        I32Const(20), MemLoad(0x28, 2, 0), Num(0xAC), Num(0x7C)))),
      datas = Vector.empty, start = None)
    run1(m, "f") shouldBe (254L + 1L + 255L + 0x01010101L)
  }

  test("call_indirect dispatches through the funcref table (SDK-compiled shape)") {
    // table [add, mul]; f(sel, a, b) = table[sel](a, b)
    val binop = FuncType(Vector(ValType.I32, ValType.I32), Vector(ValType.I32))
    val m = WasmModule(
      types = Vector(
        FuncType(Vector(ValType.I32, ValType.I32, ValType.I32), Vector(ValType.I32)),
        binop),
      imports = Vector.empty,
      funcTypeIdxs = Vector(0, 1, 1),
      memMinPages = 0, memMaxPages = None,
      globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(
        FuncBody(Vector(), Vector(
          LocalGet(1), LocalGet(2), LocalGet(0), CallIndirect(1))),
        FuncBody(Vector(), Vector(LocalGet(0), LocalGet(1), Num(0x6A))), // add
        FuncBody(Vector(), Vector(LocalGet(0), LocalGet(1), Num(0x6C)))), // mul
      datas = Vector.empty, start = None,
      tables = Vector(TableType(ValType.Funcref, 2, None)),
      elems = Vector(ElemSeg(0, Vector(1, 2))))
    // round-trips through the binary format too
    val decoded = WasmBinary.decode(WasmBinary.encode(m))
    decoded shouldBe m
    val inst = new WasmInterp.Instance(decoded, Map.empty)
    inst.invoke("f", 0L, 6L, 7L).head shouldBe 13L
    inst.invoke("f", 1L, 6L, 7L).head shouldBe 42L
    a[WasmTrap] should be thrownBy inst.invoke("f", 5L, 1L, 1L) // OOB slot
  }

  test("post-MVP decode surface: simd128, reference-types, relaxed-simd " +
      "and single-agent atomics all DECODE since r14; genuinely " +
      "unassigned opcodes and GC types still fail with NAMED errors") {
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    def named(bytes: Array[Byte], needle: String): Unit = {
      val e = intercept[WasmDecodeError](WasmBinary.decode(bytes))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // v128 param type in the type section: ACCEPTED since the simd tier
    val v128Type = WasmBinary.decode(
      header ++ sec(1, Array[Byte](0x01, 0x60, 0x01, 0x7B, 0x00)))
    assert(v128Type.types.head.params == Vector(ValType.V128))
    // funcref/externref param types: ACCEPTED since the r14 ref tier
    val refType = WasmBinary.decode(
      header ++ sec(1, Array[Byte](0x02, 0x60, 0x01, 0x70, 0x00,
        0x60, 0x01, 0x6F, 0x00)))
    assert(refType.types.map(_.params) ==
      Vector(Vector(ValType.Funcref), Vector(ValType.Externref)))
    val voidType = sec(1, Array[Byte](0x01, 0x60, 0x00, 0x00))
    val oneFunc = sec(3, Array[Byte](0x01, 0x00))
    def withBody(body: Array[Byte]): Array[Byte] = {
      val code = Array[Byte](0x01, (body.length + 1).toByte, 0x00) ++ body
      header ++ voidType ++ oneFunc ++ sec(10, code)
    }
    // relaxed-simd (0xFD 0x100–0x113) decodes since r14
    assert(WasmBinary.decode(
      withBody(Array[Byte](0xFD.toByte, 0x80.toByte, 0x02, 0x0B)))
      .codes.head.body == Vector(SimdOp(256)))
    // ...but a subopcode past the relaxed family fails by name
    named(withBody(Array[Byte](0xFD.toByte, 0x94.toByte, 0x02, 0x0B)),
      "unassigned")
    // 0xFE atomics decode since r14 (i32.atomic.load align 2 offset 0)
    assert(WasmBinary.decode(
      withBody(Array[Byte](0xFE.toByte, 0x10, 0x02, 0x00, 0x0B)))
      .codes.head.body == Vector(AtomicOp(0x10, 2, 0)))
    // the 0x04–0x0F atomic gap fails by name
    named(withBody(Array[Byte](0xFE.toByte, 0x0B, 0x0B)), "unassigned")
    // ref.null funcref / table.get 0: DECODE since the r14 ref tier
    assert(WasmBinary.decode(withBody(Array[Byte](0xD0.toByte, 0x70, 0x0B)))
      .codes.head.body == Vector(RefNull(0x70)))
    assert(WasmBinary.decode(withBody(Array[Byte](0x25, 0x00, 0x0B)))
      .codes.head.body == Vector(TableGet(0)))
    // a GC heap type behind ref.null DECODES since r16 (kind byte);
    // exn decodes too since the late-r16 EH tier; a genuinely
    // unassigned heap type still fails by name
    assert(WasmBinary.decode(withBody(Array[Byte](0xD0.toByte, 0x6B, 0x0B)))
      .codes.head.body == Vector(RefNull(ValType.Structref & 0xFF)))
    assert(WasmBinary.decode(withBody(Array[Byte](0xD0.toByte, 0x69, 0x0B)))
      .codes.head.body == Vector(RefNull(ValType.Exnref & 0xFF)))
    val eH = intercept[WasmDecodeError](
      WasmBinary.decode(withBody(Array[Byte](0xD0.toByte, 0x68, 0x0B))))
    assert(eH.getMessage.contains("unsupported heap type"), eH.getMessage)
    // v128 local declaration: accepted
    val codeV128Local = Array[Byte](0x01, 0x04, 0x01, 0x01, 0x7B, 0x0B)
    assert(WasmBinary.decode(header ++ voidType ++ oneFunc ++
      sec(10, codeV128Local)).codes.head.locals == Vector(ValType.V128))
    // a genuinely invalid opcode still reports offset, not a tier
    val e = intercept[WasmDecodeError](
      WasmBinary.decode(withBody(Array[Byte](0xF5.toByte, 0x0B))))
    assert(e.getMessage.contains("unsupported opcode"))
    // attacker-sized limits fail by NAME at decode, before any
    // allocation: table min past 2^22 slots, memory min past 1 GiB
    val eTab = intercept[WasmDecodeError](WasmBinary.decode(header ++
      sec(4, Array[Byte](0x01, 0x70, 0x00,
        0x80.toByte, 0x80.toByte, 0x80.toByte, 0x04)))) // min = 2^23
    assert(eTab.getMessage.contains("2^22-slot cap"), eTab.getMessage)
    val eMem = intercept[WasmDecodeError](WasmBinary.decode(header ++
      sec(5, Array[Byte](0x01, 0x00,
        0xC0.toByte, 0xB8.toByte, 0x02)))) // min = 40000 pages
    assert(eMem.getMessage.contains("16384-page"), eMem.getMessage)
  }

  test("validation (spec §3): type-broken modules reject by NAME at " +
      "instantiation, before a single instruction executes") {
    def reject(expect: String)(m: WasmModule): Unit = {
      val e = intercept[WasmValidateError](
        run1(WasmBinary.decode(WasmBinary.encode(m)), "f"))
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    // operand type mismatch: i32.add over i64 operands
    reject("expected i32")(func(Vector(), Vector(ValType.I32), Vector(),
      I64Const(1), I64Const(2), Num(0x6A)))
    // declared result type not produced
    reject("expected i64")(func(Vector(), Vector(ValType.I64), Vector(),
      I32Const(1)))
    // operand stack underflow
    reject("underflow")(func(Vector(), Vector(ValType.I32), Vector(),
      Num(0x6A)))
    // extra operands left at block end
    reject("extra operand")(func(Vector(), Vector(ValType.I32), Vector(),
      I32Const(1), I32Const(2)))
    // branch depth past the label stack
    reject("branch depth")(func(Vector(), Vector(), Vector(), Br(5)))
    // local / call / global index bounds
    reject("local.get")(func(Vector(), Vector(ValType.I32), Vector(),
      LocalGet(3)))
    reject("call: function index")(func(Vector(), Vector(), Vector(),
      Call(7)))
    // global.set of an immutable global
    val gm = func(Vector(), Vector(), Vector(), I32Const(1), GlobalSet(0))
      .copy(globals = Vector(
        WasmGlobal(ValType.I32, mutable = false, Vector(I32Const(0)))))
    reject("immutable global")(gm)
    // if with a result but no else
    reject("if without else")(func(Vector(), Vector(ValType.I32), Vector(),
      I32Const(1), If(ValType.I32, Vector(I32Const(2)), Vector.empty)))
    // function/code section count mismatch (a classic fuzz shape)
    reject("code section")(func(Vector(), Vector(), Vector(), Nop)
      .copy(funcTypeIdxs = Vector(0, 0)))
    // duplicate export names (spec: export names are unique)
    reject("duplicate export")(func(Vector(), Vector(), Vector(), Nop)
      .copy(exports = Vector(WasmExport("f", 0, 0), WasmExport("f", 0, 0))))
    // ...while unreachable POLYMORPHISM stays accepted: dead code may
    // conjure any types (spec's bottom type), so these validate and
    // trap only when executed
    for (m <- Seq(
      func(Vector(), Vector(ValType.I64), Vector(), Unreachable),
      // i64.add in dead code conjures its operands from the bottom type
      func(Vector(), Vector(ValType.I64), Vector(), Unreachable, Num(0x7C)))) {
      val decoded = WasmBinary.decode(WasmBinary.encode(m))
      intercept[WasmTrap](run1(decoded, "f")) // validates; traps when RUN
    }
    // ...but dead code is still TYPED: an i32.add after unreachable
    // leaves an i32 where the i64 result belongs — invalid (spec
    // appendix: pushes in dead code are concrete, only pops are bottom)
    reject("expected i64")(func(Vector(), Vector(ValType.I64), Vector(),
      Unreachable, Num(0x6A)))
    // a br-terminated block validates and RUNS, yielding its value
    run1(WasmBinary.decode(WasmBinary.encode(
      func(Vector(), Vector(ValType.I32), Vector(),
        Block(ValType.I32, Vector(I32Const(7), Br(0)))))),
      "f") shouldBe 7L
  }

  test("wasm-gc DECODE surface (r16): composite types, rec/sub groups " +
      "and typed references all decode (kind-coarsened); unimplemented " +
      "GC ops still reject by FEATURE name") {
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    // struct / array composite types carry their fields in comps
    val mStruct = WasmBinary.decode(
      header ++ sec(1, Array[Byte](0x01, 0x5F, 0x02, 0x7F, 0x01, 0x78, 0x00)))
    assert(mStruct.comps == Vector(CStruct(Vector(
      FieldType(ValType.I32, mutable = true),
      FieldType(ValType.PackedI8, mutable = false)))))
    val mArray = WasmBinary.decode(
      header ++ sec(1, Array[Byte](0x01, 0x5E, 0x77, 0x01)))
    assert(mArray.comps == Vector(CArray(
      FieldType(ValType.PackedI16, mutable = true))))
    // rec group of two mutually-referencing structs: the FORWARD
    // (ref null $1) inside $0 resolves through the two-pass kind scan
    val mRec = WasmBinary.decode(header ++ sec(1, Array[Byte](0x01,
      0x4E, 0x02,
      0x5F, 0x01, 0x63, 0x01, 0x01, // struct { mut (ref null $1) }
      0x5E, 0x63, 0x00, 0x01))) // array of mut (ref null $0)
    assert(mRec.comps == Vector(
      CStruct(Vector(FieldType(ValType.Arrayref, mutable = true))),
      CArray(FieldType(ValType.Structref, mutable = true))))
    // sub-final with a supertype bound — the bound is KEPT since the
    // cast tier landed (ref.test/ref.cast resolve declared chains)
    val mSub = WasmBinary.decode(header ++ sec(1, Array[Byte](0x02,
      0x5F, 0x00,
      0x4F, 0x01, 0x00, 0x5F, 0x01, 0x7F, 0x00)))
    assert(mSub.comps(1) == CStruct(Vector(
      FieldType(ValType.I32, mutable = false))))
    assert(mSub.superTypes == Vector(-1, 0))
    assert(mSub.superOf(1) == 0 && mSub.superOf(0) == -1)
    // typed references in a functype coarsen to kind bytes
    val mRef = WasmBinary.decode(
      header ++ sec(1, Array[Byte](0x02, 0x5F, 0x00,
        0x60, 0x02, 0x63, 0x00, 0x6E, 0x00)))
    assert(mRef.types(1).params ==
      Vector(ValType.Structref, ValType.Anyref))
    // 0xFB struct.new decodes; unimplemented GC ops reject by name
    val structType = sec(1, Array[Byte](0x02,
      0x5F, 0x01, 0x7F, 0x00, // $0: struct { i32 }
      0x60, 0x00, 0x00)) // $1: () -> ()
    val oneFunc = sec(3, Array[Byte](0x01, 0x01))
    def withBody(body: Array[Byte]): Array[Byte] = {
      val code = Array[Byte](0x01, (body.length + 1).toByte, 0x00) ++ body
      header ++ structType ++ oneFunc ++ sec(10, code)
    }
    assert(WasmBinary.decode(withBody(Array[Byte](0x41, 0x05,
      0xFB.toByte, 0x00, 0x00, 0x1A, 0x0B))).codes.head.body ==
      Vector(I32Const(5), StructNew(0), Drop))
    // the CAST tier + segment-seeded arrays DECODE since late r16
    def gcBody(body: Array[Byte]): Vector[Instr] =
      WasmBinary.decode(withBody(body)).codes.head.body
    assert(gcBody(Array[Byte](0xFB.toByte, 0x14, 0x6B, 0x0B)) ==
      Vector(RefTest(~0x6B, nullable = false)))
    assert(gcBody(Array[Byte](0xFB.toByte, 0x17, 0x00, 0x0B)) ==
      Vector(RefCast(0, nullable = true))) // concrete index kept exact
    assert(gcBody(Array[Byte](0xFB.toByte, 0x18, 0x03, 0x00,
      0x6E, 0x6B, 0x0B)) == Vector(BrOnCast(0, ~0x6E, srcNullable = true,
      ~0x6B, dstNullable = true, onFail = false)))
    assert(gcBody(Array[Byte](0xFB.toByte, 0x09, 0x00, 0x00, 0x0B)) ==
      Vector(ArrayNewData(0, 0)))
    assert(gcBody(Array[Byte](0xFB.toByte, 0x1A, 0x0B)) ==
      Vector(AnyConvertExtern))
    // what remains outside the executed surface still rejects by name
    def gcNamed(body: Array[Byte], expect: String): Unit = {
      val e = intercept[WasmDecodeError](WasmBinary.decode(withBody(body)))
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    gcNamed(Array[Byte](0xFB.toByte, 0x1F, 0x0B),
      "unassigned wasm-gc subopcode")
    gcNamed(Array[Byte](0xFB.toByte, 0x18, 0x09, 0x00, 0x6E, 0x6B, 0x0B),
      "bad flags byte")
    // a hostile s33 heap type on ref.test rejects by name, not as an
    // opaque kind byte (0x68 is genuinely unassigned; 0x69/exn decodes
    // since the late-r16 EH tier)
    gcNamed(Array[Byte](0xFB.toByte, 0x14, 0x68, 0x0B),
      "unsupported heap type")
  }

  test("wasm-gc EXECUTION (r16): i31 tag round-trips, struct fields " +
      "(packed included) read back, arrays allocate/fill/copy, the gc " +
      "arena resets per outermost invocation, misuse traps by name") {
    import ValType._
    // $0: struct { mut i32, i8 }  $1: array of mut i16  $2: (i32)->(i32)
    val comps = Vector(
      CStruct(Vector(FieldType(I32, mutable = true),
        FieldType(PackedI8, mutable = false))),
      CArray(FieldType(PackedI16, mutable = true)),
      CFunc(FuncType(Vector(I32), Vector(I32))))
    val sentinel = FuncType(Vector.empty, Vector.empty)
    def mod(body: Vector[Instr], locals: Vector[Byte] = Vector.empty) =
      WasmModule(
        types = Vector(sentinel, sentinel, FuncType(Vector(I32), Vector(I32))),
        imports = Vector.empty, funcTypeIdxs = Vector(2),
        memMinPages = 0, memMaxPages = None, globals = Vector.empty,
        exports = Vector(WasmExport("f", 0, 0)),
        codes = Vector(FuncBody(locals, body)),
        datas = Vector.empty, start = None, comps = comps)
    def run(m: WasmModule, arg: Long): Long =
      new WasmInterp.Instance(m, Map.empty).invoke("f", arg).head
    // encode -> decode round-trip preserves comps and GC instrs
    val rt = WasmBinary.decode(WasmBinary.encode(mod(Vector(
      LocalGet(0), RefI31, I31Get(signed = true), Return))))
    assert(rt.comps == comps)
    // i31: tag round-trip, sign vs zero extension at 31 bits
    assert(run(rt, -5L) == -5L)
    val mU = mod(Vector(LocalGet(0), RefI31, I31Get(signed = false), Return))
    assert(run(mU, -5L) == 0x7FFFFFFBL)
    // struct: new, field get (plain + packed _s/_u), set on mut field
    val mS = mod(Vector(
      LocalGet(0), I32Const(0xAB), StructNew(0), LocalTee(1),
      I32Const(40), StructSet(0, 0),
      LocalGet(1), StructGet(0, 0, 0),
      LocalGet(1), StructGet(0, 1, 2), Num(0x6A), // + get_u = 40 + 0xAB
      LocalGet(1), StructGet(0, 1, 1), Num(0x6A), // + get_s = .. - 85
      Return), locals = Vector(Structref))
    assert(run(mS, 7L) == 40L + 0xABL + (0xAB.toByte).toLong)
    // array: new_default, fill, set/get packed, len, copy
    val mA = mod(Vector(
      I32Const(6), ArrayNewDefault(1), LocalTee(1),
      I32Const(1), I32Const(0x1FFFF), I32Const(3), ArrayFill(1), // wraps to 0xFFFF
      LocalGet(1), I32Const(0), LocalGet(1), I32Const(1), I32Const(2),
      ArrayCopy(1, 1), // overlapping copy [1,2] -> [0,1]
      LocalGet(1), I32Const(0), ArrayGet(1, 2), // 0xFFFF (_u)
      LocalGet(1), I32Const(0), ArrayGet(1, 1), Num(0x6A), // + -1 (_s)
      LocalGet(1), ArrayLen, Num(0x6A), // + 6
      Return), locals = Vector(Arrayref))
    assert(run(mA, 0L) == 0xFFFFL - 1L + 6L)
    // arena resets per outermost invocation: allocate-heavy calls do
    // not accumulate (would hit the cap otherwise); same instance,
    // many invokes
    val inst = new WasmInterp.Instance(mod(Vector(
      LocalGet(0), I32Const(0), StructNew(0), StructGet(0, 0, 0),
      Return)), Map.empty)
    (1 to 3).foreach(i => assert(inst.invoke("f", i.toLong).head == i.toLong))
    // misuse traps by name: null deref, array OOB, i31 on a struct ref
    val eNull = intercept[WasmTrap](run(mod(Vector(
      RefNull(Structref & 0xFF), StructGet(0, 0, 0), Return),
      locals = Vector.empty), 0L))
    assert(eNull.getMessage.contains("null"), eNull.getMessage)
    val eOob = intercept[WasmTrap](run(mod(Vector(
      I32Const(2), ArrayNewDefault(1), I32Const(9), ArrayGet(1, 2),
      Return)), 0L))
    assert(eOob.getMessage.contains("array.get"), eOob.getMessage)
    // validation: cross-kind misuse rejects by NAME at instantiation
    val eKind = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(LocalGet(0), RefI31, StructGet(0, 0, 0), Return)),
      Map.empty))
    assert(eKind.getMessage.contains("expected structref"),
      eKind.getMessage)
    val eMut = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(LocalGet(0), I32Const(1), StructNew(0),
        I32Const(9), StructSet(0, 1), LocalGet(0), Return)), Map.empty))
    assert(eMut.getMessage.contains("immutable"), eMut.getMessage)
  }

  test("wasm-gc CAST tier (late r16): ref.test is PRECISE over declared " +
      "sub chains, ref.cast traps on a miss, br_on_cast dispatches, " +
      "extern conversions are identity, segment-seeded arrays read " +
      "data/elem segments, and declared-subtype hygiene validates") {
    import ValType._
    // $0 TSup: struct { mut i64 }       $1 TSub <: $0 (same shape)
    // $2 TGrand <: $1 (wider: two i64)  $3: array of mut i16
    // $4: array of mut funcref          $5: (i64) -> (i64)
    val comps = Vector(
      CStruct(Vector(FieldType(I64, mutable = true))),
      CStruct(Vector(FieldType(I64, mutable = true))),
      CStruct(Vector(FieldType(I64, mutable = true),
        FieldType(I64, mutable = true))),
      CArray(FieldType(PackedI16, mutable = true)),
      CArray(FieldType(Funcref, mutable = true)),
      CFunc(FuncType(Vector(I64), Vector(I64))))
    val supers = Vector(-1, 0, 1, -1, -1, -1)
    val sentinel = FuncType(Vector.empty, Vector.empty)
    val HtStruct = ~0x6B
    val HtArray = ~0x6A
    val HtI31 = ~0x6C
    val HtAny = ~0x6E
    def mod(body: Vector[Instr], locals: Vector[Byte] = Vector.empty,
        datas: Vector[DataSeg] = Vector.empty,
        elems: Vector[ElemSeg] = Vector.empty,
        sup: Vector[Int] = supers) =
      WasmModule(
        types = Vector.fill(5)(sentinel) :+ FuncType(Vector(I64), Vector(I64)),
        imports = Vector.empty, funcTypeIdxs = Vector(5),
        memMinPages = 0, memMaxPages = None, globals = Vector.empty,
        exports = Vector(WasmExport("f", 0, 0)),
        codes = Vector(FuncBody(locals, body)),
        datas = datas, start = None, elems = elems,
        comps = comps, superTypes = sup)
    def run(m: WasmModule, arg: Long): Long =
      new WasmInterp.Instance(m, Map.empty).invoke("f", arg).head
    def testsOn(mk: Vector[Instr], probes: (Instr, Long)*): Unit =
      probes.foreach { case (probe, want) =>
        assert(run(mod(mk ++ Vector(probe,
          Num(0xAD) /* i64.extend_i32_u */, Return)), 0L) == want,
          s"$probe on $mk")
      }
    // precision: a $1 instance is $1, $0 (chain), struct — not $2
    // (reverse), not array, not i31; a $0 instance is NOT $1 (sibling
    // structural identity does not cast)
    val mkSub = Vector[Instr](I64Const(41L), StructNew(1))
    testsOn(mkSub,
      RefTest(1, nullable = false) -> 1L,
      RefTest(0, nullable = false) -> 1L,
      RefTest(2, nullable = false) -> 0L,
      RefTest(HtStruct, nullable = false) -> 1L,
      RefTest(HtArray, nullable = false) -> 0L,
      RefTest(HtI31, nullable = false) -> 0L)
    testsOn(Vector[Instr](I64Const(1L), StructNew(0)),
      RefTest(1, nullable = false) -> 0L,
      RefTest(0, nullable = false) -> 1L)
    // a $2 instance matches the whole chain
    testsOn(Vector[Instr](I64Const(1L), I64Const(2L), StructNew(2)),
      RefTest(1, nullable = false) -> 1L,
      RefTest(0, nullable = false) -> 1L,
      RefTest(2, nullable = false) -> 1L)
    // null: only the nullable variants admit it
    testsOn(Vector[Instr](RefNull(0x6B)),
      RefTest(1, nullable = false) -> 0L,
      RefTest(1, nullable = true) -> 1L,
      RefTest(HtStruct, nullable = true) -> 1L)
    // ref.cast: up-cast passes and PRESERVES the value; a miss traps
    assert(run(mod(Vector(
      I64Const(41L), StructNew(1), RefCast(0, nullable = false),
      RefCast(HtStruct, nullable = false),
      StructGet(1, 0, 0), Return)), 0L) == 41L)
    val eCast = intercept[WasmTrap](run(mod(Vector(
      I64Const(1L), StructNew(0), RefCast(1, nullable = false),
      StructGet(1, 0, 0), Return)), 0L))
    assert(eCast.getMessage.contains("ref.cast"), eCast.getMessage)
    // br_on_cast dispatch: even args box a struct (+100), odd args ride
    // an i31 (+200) — one body, two typed paths
    val dispatch = mod(Vector(
      LocalGet(0), I64Const(1L), Num(0x83) /* i64.and */,
      Num(0x50) /* i64.eqz */,
      If(0x6E /* anyref */, Vector(LocalGet(0), StructNew(1)),
        Vector(LocalGet(0), Num(0xA7) /* i32.wrap */, RefI31)),
      LocalSet(1),
      Block(0x7E /* i64 */, Vector(
        Block(0x6B /* structref */, Vector(
          LocalGet(1),
          BrOnCast(0, HtAny, srcNullable = true, HtStruct,
            dstNullable = false, onFail = false),
          RefCast(HtI31, nullable = false), I31Get(signed = true),
          Num(0xAC) /* i64.extend_i32_s */, I64Const(200L), Num(0x7C),
          Br(1))),
        RefCast(1, nullable = false), StructGet(1, 0, 0),
        I64Const(100L), Num(0x7C) /* i64.add */)),
      Return), locals = Vector(Anyref))
    assert(run(dispatch, 4L) == 104L)
    assert(run(dispatch, 7L) == 207L)
    // br_on_cast_fail: the NON-struct leaves; the struct falls through
    val viaFail = mod(Vector(
      Block(0x7E, Vector(
        Block(0x6E /* anyref */, Vector(
          I64Const(9L), StructNew(1),
          BrOnCast(0, HtAny, srcNullable = true, HtStruct,
            dstNullable = false, onFail = true),
          RefCast(1, nullable = false), StructGet(1, 0, 0), Br(1))),
        Drop, I64Const(-1L))),
      Return))
    assert(run(viaFail, 0L) == 9L)
    // extern conversions: identity round trip, null stays null
    assert(run(mod(Vector(
      I64Const(5L), StructNew(1),
      ExternConvertAny, AnyConvertExtern,
      RefCast(1, nullable = false), StructGet(1, 0, 0), Return)), 0L) == 5L)
    assert(run(mod(Vector(
      RefNull(0x6E), ExternConvertAny, AnyConvertExtern,
      RefIsNull, Num(0xAD), Return)), 0L) == 1L)
    // array.new_data reads LE lanes from a passive segment;
    // array.init_data patches in place; OOB traps by name
    val seg = DataSeg(-1, Vector[Byte](0x01, 0x02, 0x03, 0x04),
      passive = true)
    assert(run(mod(Vector(
      I32Const(1), I32Const(1), ArrayNewData(3, 0), LocalTee(1),
      I32Const(0), ArrayGet(3, 2), Num(0xAD), Return),
      locals = Vector(Arrayref), datas = Vector(seg)), 0L) == 0x0302L)
    assert(run(mod(Vector(
      I32Const(0), I32Const(2), ArrayNewData(3, 0), LocalTee(1),
      I32Const(0), I32Const(2), I32Const(1), ArrayInitData(3, 0),
      LocalGet(1), I32Const(0), ArrayGet(3, 2), Num(0xAD), Return),
      locals = Vector(Arrayref), datas = Vector(seg)), 0L) == 0x0403L)
    val eOobData = intercept[WasmTrap](run(mod(Vector(
      I32Const(2), I32Const(2), ArrayNewData(3, 0), Drop,
      I64Const(0L), Return), datas = Vector(seg)), 0L))
    assert(eOobData.getMessage.contains("array.new_data"),
      eOobData.getMessage)
    // array.new_elem seeds funcrefs (with nulls) from a passive elem
    // segment; array.init_elem patches
    val eseg = ElemSeg(-1, Vector(0, -1), mode = 1)
    assert(run(mod(Vector(
      I32Const(0), I32Const(2), ArrayNewElem(4, 0), LocalTee(1),
      I32Const(1), ArrayGet(4, 0), RefIsNull, // slot 1 = null → 1
      LocalGet(1), I32Const(0), ArrayGet(4, 0), RefIsNull, // slot 0 → 0
      Num(0x6A) /* i32.add */, Num(0xAD), Return),
      locals = Vector(Arrayref), elems = Vector(eseg)), 0L) == 1L)
    assert(run(mod(Vector(
      I32Const(0), I32Const(2), ArrayNewElem(4, 0), LocalTee(1),
      I32Const(1), I32Const(0), I32Const(1), ArrayInitElem(4, 0),
      LocalGet(1), I32Const(1), ArrayGet(4, 0), RefIsNull,
      Num(0xAD), Return),
      locals = Vector(Arrayref), elems = Vector(eseg)), 0L) == 0L)
    // round trip: superTypes + the new instrs survive encode -> decode
    val rt = WasmBinary.decode(WasmBinary.encode(dispatch))
    assert(rt == dispatch)
    assert(run(rt, 4L) == 104L && run(rt, 7L) == 207L)
    // validation hygiene, all by name:
    def rejects(m: WasmModule, expect: String): Unit = {
      val e = intercept[WasmValidateError](
        new WasmInterp.Instance(m, Map.empty))
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    // cross-hierarchy br_on_cast
    rejects(mod(Vector(
      Block(0x6B, Vector(I64Const(1L), StructNew(1),
        BrOnCast(0, HtAny, srcNullable = true, ~0x70,
          dstNullable = false, onFail = false), Unreachable)),
      Drop, I64Const(0L), Return)), "different hierarchies")
    // array.new_data on a reference-element array
    rejects(mod(Vector(
      I32Const(0), I32Const(0), ArrayNewData(4, 0), Drop,
      I64Const(0L), Return), datas = Vector(seg)), "array.new_data")
    // declared supertype of a different kind
    rejects(mod(Vector(I64Const(0L), Return),
      sup = Vector(-1, 0, 1, 1, -1, -1)), "different composite kind")
    // mutable-field refinement is invariant: widen $1's field to i32
    val badComps = comps.updated(1,
      CStruct(Vector(FieldType(I32, mutable = true))))
    val eInv = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(I64Const(0L), Return)).copy(comps = badComps),
      Map.empty))
    assert(eInv.getMessage.contains("invariant"), eInv.getMessage)
  }

  test("function-references tier (late r16): return_call runs tail-" +
      "recursive loops in CONSTANT JVM stack, mutual tail recursion " +
      "works, call_ref/return_call_ref vet the typed reference, " +
      "br_on_null/br_on_non_null dispatch, ref.as_non_null traps") {
    import ValType._
    val tI64 = FuncType(Vector(I64), Vector(I64))
    val tAcc = FuncType(Vector(I64, I64), Vector(I64))
    def mod(types: Vector[FuncType], funcTypeIdxs: Vector[Int],
        codes: Vector[FuncBody], elems: Vector[ElemSeg] = Vector.empty,
        tables: Vector[TableType] = Vector.empty) =
      WasmModule(types = types, imports = Vector.empty,
        funcTypeIdxs = funcTypeIdxs, memMinPages = 0, memMaxPages = None,
        globals = Vector.empty,
        exports = Vector(WasmExport("f", 0, 0)),
        codes = codes, datas = Vector.empty, start = None,
        tables = tables, elems = elems)
    def run(m: WasmModule, args: Long*): Long =
      new WasmInterp.Instance(m, Map.empty).invoke("f", args: _*).head

    // sum(n) tail-accumulator: f(n) = go(n, 0); go(0, a) = a;
    // go(n, a) = return_call go(n-1, a+n). Depth 200k would blow the
    // JVM stack under call+return; constant-stack TCO must survive.
    val mSum = mod(Vector(tI64, tAcc), Vector(0, 1), Vector(
      FuncBody(Vector(), Vector(
        LocalGet(0), I64Const(0L), ReturnCall(1))),
      FuncBody(Vector(), Vector(
        LocalGet(0), Num(0x50) /* eqz */,
        If(0x40, Vector(LocalGet(1), Return), Vector.empty),
        LocalGet(0), I64Const(1L), Num(0x7D) /* sub */,
        LocalGet(1), LocalGet(0), Num(0x7C) /* add */,
        ReturnCall(1)))))
    val n = 200000L
    assert(run(mSum, n) == n * (n + 1) / 2)
    // round trip through the codec preserves the new instrs
    assert(WasmBinary.decode(WasmBinary.encode(mSum)) == mSum)

    // mutual tail recursion: even/odd over 100001 hops
    val mEo = mod(Vector(tI64, tI64, tI64), Vector(0, 1, 2), Vector(
      FuncBody(Vector(), Vector(LocalGet(0), ReturnCall(1))),
      FuncBody(Vector(), Vector( // even?
        LocalGet(0), Num(0x50),
        If(0x40, Vector(I64Const(1L), Return), Vector.empty),
        LocalGet(0), I64Const(1L), Num(0x7D), ReturnCall(2))),
      FuncBody(Vector(), Vector( // odd? — tail call INSIDE the If arm,
        // pinning TAIL-signal propagation through block frames
        LocalGet(0), Num(0x50),
        If(0x40, Vector(I64Const(0L), Return), Vector(
          LocalGet(0), I64Const(1L), Num(0x7D), ReturnCall(1))),
        Unreachable))))
    assert(run(mEo, 100001L) == 0L)

    // call_ref through a ref.func value; null call_ref traps named;
    // return_call_ref chains
    val mCr = mod(Vector(tI64, tI64), Vector(0, 1), Vector(
      FuncBody(Vector(), Vector(
        LocalGet(0), RefFunc(1), CallRef(1), I64Const(100L), Num(0x7C),
        Return)),
      FuncBody(Vector(), Vector(
        LocalGet(0), I64Const(3L), Num(0x7C), Return))),
      // declarative segment makes index 1 a legal ref.func target
      elems = Vector(ElemSeg(-1, Vector(1), mode = 2)))
    assert(run(mCr, 5L) == 108L)
    val mNull = mod(Vector(tI64), Vector(0), Vector(
      FuncBody(Vector(), Vector(
        LocalGet(0), RefNull(0x70), CallRef(0), Return))))
    val eNull = intercept[WasmTrap](run(mNull, 1L))
    assert(eNull.getMessage.contains("null function reference"))
    val mRcr = mod(Vector(tI64, tI64), Vector(0, 1), Vector(
      FuncBody(Vector(), Vector(
        LocalGet(0), RefFunc(1), ReturnCallRef(1))),
      FuncBody(Vector(), Vector(
        LocalGet(0), I64Const(7L), Num(0x7E) /* mul */, Return))),
      elems = Vector(ElemSeg(-1, Vector(1), mode = 2)))
    assert(run(mRcr, 6L) == 42L)

    // return_call_indirect through a table
    val mRci = mod(Vector(tI64, tI64), Vector(0, 1), Vector(
      FuncBody(Vector(), Vector(
        LocalGet(0), I32Const(0), ReturnCallIndirect(1))),
      FuncBody(Vector(), Vector(
        LocalGet(0), I64Const(11L), Num(0x7C), Return))),
      elems = Vector(ElemSeg(0, Vector(1))),
      tables = Vector(TableType(Funcref, 2, None)))
    assert(run(mRci, 4L) == 15L)

    // br_on_null / br_on_non_null / ref.as_non_null
    val mBn = mod(Vector(tI64), Vector(0), Vector(
      FuncBody(Vector(ValType.Funcref), Vector(
        // null local: br_on_null takes the branch (no value carried)
        Block(0x40, Vector(
          LocalGet(1), BrOnNull(0), Drop, Unreachable)),
        // non-null: br_on_non_null carries the ref to its label
        Block(ValType.Funcref & 0xFF, Vector(
          RefFunc(0), BrOnNonNull(0), Unreachable)),
        RefAsNonNull, RefIsNull, Num(0xAD) /* extend_u */,
        LocalGet(0), Num(0x7C), Return))),
      elems = Vector(ElemSeg(-1, Vector(0), mode = 2)))
    assert(run(mBn, 40L) == 40L) // is_null(func ref) = 0
    val mAnn = mod(Vector(tI64), Vector(0), Vector(
      FuncBody(Vector(), Vector(
        RefNull(0x70), RefAsNonNull, Drop, LocalGet(0), Return))))
    val eAnn = intercept[WasmTrap](run(mAnn, 1L))
    assert(eAnn.getMessage.contains("ref.as_non_null"))

    // validation: a tail call whose callee results differ is rejected
    // by name; br_on_non_null needs a ref-carrying label
    val tNone = FuncType(Vector(I64), Vector.empty)
    val mBad = mod(Vector(tI64, tNone), Vector(0, 1), Vector(
      FuncBody(Vector(), Vector(LocalGet(0), ReturnCall(1))),
      FuncBody(Vector(), Vector(Drop))))
    val eBad = intercept[WasmValidateError](
      new WasmInterp.Instance(mBad, Map.empty))
    assert(eBad.getMessage.contains("callee result types"))
    val mBadLbl = mod(Vector(tI64), Vector(0), Vector(
      FuncBody(Vector(), Vector(
        Block(0x40, Vector(RefFunc(0), BrOnNonNull(0), Unreachable)),
        LocalGet(0), Return))),
      elems = Vector(ElemSeg(-1, Vector(0), mode = 2)))
    val eLbl = intercept[WasmValidateError](
      new WasmInterp.Instance(mBadLbl, Map.empty))
    assert(eLbl.getMessage.contains("br_on_non_null"))
  }

  test("exception-handling tier (late r16): throw/catch by tag with " +
      "payload, dispatch order, catch_all, catch_ref + throw_ref " +
      "rethrow, unwinding through call frames, uncaught -> named trap, " +
      "and the validation contract") {
    import ValType._
    val tI64 = FuncType(Vector(I64), Vector(I64))
    val tagSig = FuncType(Vector(I64), Vector.empty)
    val emptySig = FuncType(Vector.empty, Vector.empty)
    def mod(types: Vector[FuncType], tags: Vector[WasmTag],
        funcTypeIdxs: Vector[Int], codes: Vector[FuncBody]) =
      WasmModule(types = types, imports = Vector.empty,
        funcTypeIdxs = funcTypeIdxs, memMinPages = 0, memMaxPages = None,
        globals = Vector.empty,
        exports = Vector(WasmExport("f", 0, 0)),
        codes = codes, datas = Vector.empty, start = None, tags = tags)
    def run(m: WasmModule, args: Long*): Long =
      new WasmInterp.Instance(m, Map.empty).invoke("f", args: _*).head

    // even x: compute 2x in the try body (no throw); odd x: throw with
    // payload x, catch reads it back +100
    val mCatch = mod(Vector(tI64, tagSig), Vector(WasmTag(1)),
      Vector(0), Vector(FuncBody(Vector(), Vector(
        Block(0x7E, Vector(
          TryTable(0x7E, Vector(CatchTag(0, 0)), Vector(
            LocalGet(0), I64Const(1L), Num(0x83) /* and */, Num(0x50),
            If(0x7E, Vector(LocalGet(0), I64Const(2L), Num(0x7E)),
              Vector(LocalGet(0), Throw(0), Unreachable)))),
          // fallthrough (no throw): result rides out; a branch from a
          // catch lands HERE with the payload — add 100 only then? no:
          // distinguish by range — keep simple: the catch pushes
          // payload, and both paths exit this block with one i64
          Br(0))),
        Return))))
    assert(run(mCatch, 8L) == 16L)
    assert(run(mCatch, 9L) == 9L) // payload passed through the catch
    // codec round-trips the tag section + try_table form
    assert(WasmBinary.decode(WasmBinary.encode(mCatch)) == mCatch)

    // dispatch order + catch_all: tag0 and tag1 declared; throwing
    // tag1 must skip the tag0 clause and hit catch_all (no payload)
    val mOrder = mod(Vector(tI64, tagSig, emptySig),
      Vector(WasmTag(1), WasmTag(2)), Vector(0),
      Vector(FuncBody(Vector(), Vector(
        Block(0x40, Vector(
          Block(0x7E, Vector(
            TryTable(0x7E, Vector(CatchTag(0, 0), CatchAll(1)), Vector(
              Throw(1), Unreachable)),
            Br(0))),
          // tag0 path would land here with a payload
          Drop, Unreachable)),
        // catch_all lands here: no payload
        I64Const(77L), Return))))
    assert(run(mOrder, 0L) == 77L)

    // catch_all_ref + throw_ref: inner handler captures the package
    // and rethrows it to the outer tag handler, payload intact
    val mRethrow = mod(Vector(tI64, tagSig), Vector(WasmTag(1)),
      Vector(0), Vector(FuncBody(Vector(ValType.Exnref), Vector(
        Block(0x7E, Vector(
          Block(ValType.Exnref & 0xFF, Vector(
            TryTable(0x7E, Vector(CatchAllRef(0)), Vector(
              LocalGet(0), Throw(0), Unreachable)),
            Unreachable)),
          // captured exnref parks in a local (a try body cannot reach
          // below its own frame), then rethrows to the outer handler
          LocalSet(1),
          Block(0x7E, Vector(
            TryTable(0x7E, Vector(CatchTag(0, 0)), Vector(
              LocalGet(1), ThrowRef, Unreachable)),
            Unreachable)),
          I64Const(1000L), Num(0x7C))),
        Return))))
    assert(run(mRethrow, 42L) == 1042L)

    // a throw unwinds THROUGH a call frame to the caller's handler
    val mThrough = mod(Vector(tI64, tagSig), Vector(WasmTag(1)),
      Vector(0, 0), Vector(
        FuncBody(Vector(), Vector(
          Block(0x7E, Vector(
            TryTable(0x7E, Vector(CatchTag(0, 0)), Vector(
              LocalGet(0), Call(1), Unreachable)),
            Br(0))),
          I64Const(500L), Num(0x7C), Return)),
        FuncBody(Vector(), Vector(
          LocalGet(0), Throw(0), Unreachable))))
    assert(run(mThrough, 7L) == 507L)

    // uncaught: named trap, not a raw exception
    val mUncaught = mod(Vector(tI64, tagSig), Vector(WasmTag(1)),
      Vector(0), Vector(FuncBody(Vector(), Vector(
        LocalGet(0), Throw(0), Unreachable))))
    val eUn = intercept[WasmTrap](run(mUncaught, 1L))
    assert(eUn.getMessage.contains("uncaught wasm exception"),
      eUn.getMessage)
    // throw_ref on null traps named
    val mNullRef = mod(Vector(tI64, tagSig), Vector(WasmTag(1)),
      Vector(0), Vector(FuncBody(Vector(), Vector(
        RefNull(ValType.Exnref & 0xFF), ThrowRef, Unreachable))))
    val eNullT = intercept[WasmTrap](run(mNullRef, 1L))
    assert(eNullT.getMessage.contains("null exception reference"))

    // validation: tag types need empty results; a catch target label
    // must accept the payload; legacy EH opcodes reject at decode
    val eTagRes = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(tI64), Vector(WasmTag(0)), Vector(0),
        Vector(FuncBody(Vector(), Vector(LocalGet(0), Return)))),
      Map.empty))
    assert(eTagRes.getMessage.contains("empty results"))
    val eLbl = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(tI64, tagSig), Vector(WasmTag(1)), Vector(0),
        Vector(FuncBody(Vector(), Vector(
          Block(0x40, Vector(
            TryTable(0x40, Vector(CatchTag(0, 0)), Vector.empty))),
          LocalGet(0), Return)))), Map.empty))
    assert(eLbl.getMessage.contains("try_table"), eLbl.getMessage)
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    val eLegacy = intercept[WasmDecodeError](WasmBinary.decode(header ++
      sec(1, Array[Byte](0x01, 0x60, 0x00, 0x00)) ++
      sec(3, Array[Byte](0x01, 0x00)) ++
      sec(10, Array[Byte](0x01, 0x04, 0x00, 0x06, 0x40, 0x0B))))
    assert(eLegacy.getMessage.contains("legacy exception-handling"))
  }

  test("memory64 (late r16): i64 addresses load/store, size/grow speak " +
      "i64 pages, bulk ops take i64 ranges, far pointers TRAP instead " +
      "of wrapping, and the typing contract flips to i64") {
    import ValType._
    def mod(body: Vector[Instr], results: Vector[Byte] = Vector(I64),
        datas: Vector[DataSeg] = Vector.empty) =
      WasmModule(
        types = Vector(FuncType(Vector(I64), results)),
        imports = Vector.empty, funcTypeIdxs = Vector(0),
        memMinPages = 2, memMaxPages = Some(4), globals = Vector.empty,
        exports = Vector(WasmExport("f", 0, 0)),
        codes = Vector(FuncBody(Vector(), body)),
        datas = datas, start = None, mem64 = true)
    def run(m: WasmModule, arg: Long): Long =
      new WasmInterp.Instance(m, Map.empty).invoke("f", arg).head
    // store at an i64 address on the SECOND page, read back
    val mRw = mod(Vector(
      I64Const(70000L), LocalGet(0), MemStore(0x37, 3, 0),
      I64Const(70000L), MemLoad(0x29, 3, 0), Return))
    assert(run(mRw, 0x1122334455667788L) == 0x1122334455667788L)
    // round trip through the codec: flags bit 2 + i64 limits survive
    val rt = WasmBinary.decode(WasmBinary.encode(mRw))
    assert(rt.mem64 && rt.memMinPages == 2 && rt.memMaxPages.contains(4))
    assert(run(rt, 7L) == 7L)
    // size/grow as i64 pages
    val mGrow = mod(Vector(
      MemorySize, I64Const(1L), MemoryGrow, Num(0x7C) /* add */,
      MemorySize, Num(0x7C), Return))
    assert(run(mGrow, 0L) == 2L + 2L + 3L) // size + old-size + new-size
    // far pointer: traps OOB, never wraps into the low pages
    val mFar = mod(Vector(
      LocalGet(0), MemLoad(0x29, 3, 0), Return))
    val eFar = intercept[WasmTrap](run(mFar, (1L << 40) + 8L))
    assert(eFar.getMessage.contains("out of bounds"), eFar.getMessage)
    val eNeg = intercept[WasmTrap](run(mFar, -16L))
    assert(eNeg.getMessage.contains("out of bounds"))
    // bulk ops with i64 ranges + an i64 active data offset
    val seg = DataSeg(65600, Vector[Byte](1, 2, 3, 4))
    val mBulk = mod(Vector(
      // copy the 4 seeded bytes down to 16, fill 2 bytes at 24
      I64Const(16L), I64Const(65600L), I64Const(4L), MemoryCopy,
      I64Const(24L), I32Const(0x5A), I64Const(2L), MemoryFill,
      I64Const(16L), MemLoad(0x28, 2, 0), Num(0xAD) /* ext_u */,
      I64Const(24L), MemLoad(0x2D, 0, 0) /* load8_u */, Num(0xAD),
      Num(0x7C), Return), datas = Vector(seg))
    assert(run(mBulk, 0L) == 0x04030201L + 0x5AL)
    // typing: an i32 address in a memory64 module rejects by name
    val eTy = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(I32Const(0), MemLoad(0x29, 3, 0), Return)), Map.empty))
    assert(eTy.getMessage.contains("expected i64"), eTy.getMessage)
    // bounded scope: atomics + memory64 reject by name
    val eAt = intercept[WasmValidateError](new WasmInterp.Instance(
      mod(Vector(I64Const(0L), AtomicOp(0x11, 3, 0), Return)), Map.empty))
    assert(eAt.getMessage.contains("memory64"), eAt.getMessage)
    // limits hygiene: a 2^48-page minimum rejects by name at decode
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    val eBig = intercept[WasmDecodeError](WasmBinary.decode(header ++
      sec(5, Array[Byte](0x01, 0x04,
        0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
        0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01))))
    assert(eBig.getMessage.contains("16384-page"), eBig.getMessage)
  }

  test("memory limit hygiene at decode: duplicate memory, shared " +
      "without max, above-cap declared maxima") {
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    def named(bytes: Array[Byte], expect: String): Unit = {
      val e = intercept[WasmDecodeError](WasmBinary.decode(bytes))
      assert(e.getMessage.contains(expect), e.getMessage)
    }
    val importMem = sec(2, Array[Byte](0x01,
      0x03, 'e', 'n', 'v', 0x06, 'm', 'e', 'm', 'o', 'r', 'y',
      0x02, 0x00, 0x01))
    // import + section 5 double declaration (spec: at most one memory)
    named(header ++ importMem ++ sec(5, Array[Byte](0x01, 0x00, 0x01)),
      "duplicate memory")
    // shared (flags bit 1) without a declared max
    named(header ++ sec(5, Array[Byte](0x01, 0x02, 0x01)),
      "shared memory without a declared max")
    // declared max above the 16384-page engine cap
    named(header ++ sec(5, Array[Byte](0x01, 0x01, 0x01,
      0xC0.toByte, 0xB8.toByte, 0x02)), "16384-page") // max = 40000
    // max < min
    named(header ++ sec(5, Array[Byte](0x01, 0x01, 0x05, 0x02)),
      "max 2 < min 5")
    // table declared max above the 2^22-slot cap
    named(header ++ sec(4, Array[Byte](0x01, 0x70, 0x01, 0x00,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x04)), "2^22")
  }

  test("imported SHARED memory (the -pthread module shape) instantiates " +
      "with the imported limits and runs atomics on it") {
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    val bytes = header ++
      sec(1, Array[Byte](0x01, 0x60, 0x00, 0x01, 0x7E)) ++ // () -> i64
      sec(2, Array[Byte](0x01, // import env.memory shared 1..2 pages
        0x03, 'e', 'n', 'v', 0x06, 'm', 'e', 'm', 'o', 'r', 'y',
        0x02, 0x03, 0x01, 0x02)) ++
      sec(3, Array[Byte](0x01, 0x00)) ++
      sec(7, Array[Byte](0x01, 0x01, 'f', 0x00, 0x00)) ++
      sec(10, Array[Byte](0x01, 0x08, 0x00, // one body, no locals
        0x41, 0x00, // i32.const 0
        0xFE.toByte, 0x11, 0x03, 0x00, // i64.atomic.load align 3 off 0
        0x0B))
    val m = WasmBinary.decode(bytes)
    assert(m.memMinPages == 1 && m.memMaxPages.contains(2))
    assert(m.imports.isEmpty, "memory import must not join the func space")
    run1(m, "f") shouldBe 0L
  }

  test("execution fuel: an infinite loop traps with the named " +
      "step-budget error, unbounded recursion traps as stack " +
      "exhaustion, and the budget resets per outermost invocation") {
    val spin = WasmModule(
      types = Vector(FuncType(Vector(), Vector(ValType.I64))),
      imports = Vector.empty, funcTypeIdxs = Vector(0),
      memMinPages = 1, memMaxPages = None, globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 0)),
      codes = Vector(FuncBody(Vector(),
        Vector(Loop(0x40, Vector(Br(0))), I64Const(1)))),
      datas = Vector.empty, start = None)
    val eF = intercept[WasmTrap](new WasmInterp.Instance(
      WasmBinary.decode(WasmBinary.encode(spin)), Map.empty,
      stepBudget = 10000).invoke("f"))
    assert(eF.getMessage.contains("step budget"), eF.getMessage)
    // f() = f(): the JVM stack exhausts before default fuel — named trap
    val rec = spin.copy(codes = Vector(FuncBody(Vector(), Vector(Call(0)))))
    val eR = intercept[WasmTrap](new WasmInterp.Instance(
      WasmBinary.decode(WasmBinary.encode(rec)), Map.empty).invoke("f"))
    assert(eR.getMessage.contains("call stack exhausted"), eR.getMessage)
    // 1500 bounded iterations under a 2000-step budget, invoked twice:
    // only a per-outermost-invocation reset lets the second call pass
    val count = spin.copy(codes = Vector(FuncBody(Vector(ValType.I32),
      Vector(
        I32Const(1500), LocalSet(0),
        Block(0x40, Vector(
          Loop(0x40, Vector(
            LocalGet(0), Num(0x45), BrIf(1),
            LocalGet(0), I32Const(1), Num(0x6B), LocalSet(0),
            Br(0))))),
        I64Const(7)))))
    val inst = new WasmInterp.Instance(
      WasmBinary.decode(WasmBinary.encode(count)), Map.empty,
      stepBudget = 2000)
    inst.invoke("f").head shouldBe 7L
    inst.invoke("f").head shouldBe 7L
  }

  test("atomics execute with single-agent semantics: loads/stores/rmw " +
      "families, cmpxchg hit and miss, narrow widths wrap, alignment " +
      "traps, wait/notify return codes, infinite wait traps loudly") {
    // result type follows the LAST instruction (validation is real now:
    // the declared result must match what the body actually produces)
    def run(instrs: Instr*): Long = {
      val rt = instrs.last match {
        case AtomicOp(sub, _, _) =>
          val k =
            if (sub <= 2) 0
            else if (sub <= 0x16) sub - 0x10
            else if (sub <= 0x1D) sub - 0x17
            else if (sub <= 0x47) (sub - 0x1E) % 7
            else sub - 0x48
          if (sub <= 2 || k == 0 || k == 2 || k == 3) ValType.I32
          else ValType.I64
        case _ => ValType.I64
      }
      run1(WasmBinary.decode(WasmBinary.encode(
        func(Vector(), Vector(rt), Vector(), instrs: _*))), "f")
    }
    // rmw add returns the OLD value and updates memory
    run(I32Const(16), I32Const(5), AtomicOp(0x1E, 2, 0), Drop,
      I32Const(16), I32Const(7), AtomicOp(0x1E, 2, 0)) shouldBe 5L
    // i64 store + xchg
    run(I32Const(8), I64Const(11), AtomicOp(0x18, 3, 0),
      I32Const(8), I64Const(22), AtomicOp(0x42, 3, 0)) shouldBe 11L
    // cmpxchg hit: expected matches -> replacement lands
    run(I32Const(4), I32Const(9), AtomicOp(0x17, 2, 0),
      I32Const(4), I32Const(9), I32Const(33), AtomicOp(0x48, 2, 0), Drop,
      I32Const(4), AtomicOp(0x10, 2, 0)) shouldBe 33L
    // cmpxchg miss: old returned, memory untouched
    run(I32Const(4), I32Const(9), AtomicOp(0x17, 2, 0),
      I32Const(4), I32Const(1), I32Const(33), AtomicOp(0x48, 2, 0), Drop,
      I32Const(4), AtomicOp(0x10, 2, 0)) shouldBe 9L
    // narrow rmw8.add_u wraps at the byte
    run(I32Const(3), I32Const(250), AtomicOp(0x19, 0, 0),
      I32Const(3), I32Const(10), AtomicOp(0x20, 0, 0), Drop,
      I32Const(3), AtomicOp(0x12, 0, 0)) shouldBe 4L
    // and / or / xor / sub families, i32 width
    run(I32Const(0), I32Const(0xF0), AtomicOp(0x17, 2, 0),
      I32Const(0), I32Const(0x3C), AtomicOp(0x2C, 2, 0), Drop, // and
      I32Const(0), I32Const(0x03), AtomicOp(0x33, 2, 0), Drop, // or
      I32Const(0), I32Const(0xFF), AtomicOp(0x3A, 2, 0), Drop, // xor
      I32Const(0), I32Const(2), AtomicOp(0x25, 2, 0), Drop, // sub
      I32Const(0), AtomicOp(0x10, 2, 0)) shouldBe
      (((0xF0 & 0x3C) | 0x03) ^ 0xFF) - 2L
    // alignment trap (i32 load at address 2)
    val eA = intercept[WasmTrap](run(I32Const(2), AtomicOp(0x10, 2, 0)))
    assert(eA.getMessage.contains("unaligned atomic"))
    // wait32: value mismatch -> 1 ("not-equal")
    run(I32Const(0), I32Const(1), I64Const(-1),
      AtomicOp(0x01, 2, 0)) shouldBe 1L
    // wait32: match with finite timeout -> 2 ("timed-out")
    run(I32Const(0), I32Const(0), I64Const(0),
      AtomicOp(0x01, 2, 0)) shouldBe 2L
    // wait32: match with infinite timeout -> loud deadlock trap
    val eW = intercept[WasmTrap](run(I32Const(0), I32Const(0),
      I64Const(-1), AtomicOp(0x01, 2, 0)))
    assert(eW.getMessage.contains("deadlock"))
    // notify: no waiters can exist -> 0; fence is a no-op
    run(I32Const(0), I32Const(5), AtomicOp(0x00, 2, 0)) shouldBe 0L
    run(AtomicFence, I64Const(42)) shouldBe 42L
  }

  test("relaxed-simd executes under the deterministic profile: every op " +
      "behaves as its strict sibling") {
    def run(instrs: Instr*): Long = {
      val rt = instrs.last match {
        case SimdLane(29, _) => ValType.I64
        case SimdLane(31, _) => ValType.F32
        case SimdLane(33, _) => ValType.F64
        case _: SimdLane => ValType.I32
        case _ => ValType.I64
      }
      run1(WasmBinary.decode(WasmBinary.encode(
        func(Vector(), Vector(rt), Vector(), instrs: _*))), "f")
    }
    def constV(bytes: Int*): Instr = SimdConst(bytes.map(_.toByte).toVector)
    def f32s(v: Float): Vector[Instr] =
      Vector(F32Const(java.lang.Float.floatToIntBits(v)), SimdOp(19))
    def bits32(v: Float): Long =
      java.lang.Float.floatToIntBits(v).toLong & 0xFFFFFFFFL
    // relaxed_madd / nmadd: unfused (2·3)+4 = 10, -(2·3)+4 = -2
    run(f32s(2f) ++ f32s(3f) ++ f32s(4f) ++
      Vector(SimdOp(261), SimdLane(31, 0)): _*) shouldBe bits32(10f)
    run(f32s(2f) ++ f32s(3f) ++ f32s(4f) ++
      Vector(SimdOp(262), SimdLane(31, 0)): _*) shouldBe bits32(-2f)
    // relaxed_laneselect ≡ bitselect: (AA & F0) | (55 & ~F0) = A5
    run(constV(Seq.fill(16)(0xAA): _*), constV(Seq.fill(16)(0x55): _*),
      constV(Seq.fill(16)(0xF0): _*), SimdOp(266),
      SimdLane(22, 0)) shouldBe 0xA5L
    // relaxed_trunc_f32x4_s: saturating, NaN -> 0
    run(f32s(5.7f) ++ Vector(SimdOp(257), SimdLane(27, 1)): _*) shouldBe 5L
    run(f32s(Float.NaN) ++ Vector(SimdOp(257), SimdLane(27, 0)): _*) shouldBe 0L
    // relaxed_swizzle: OOB index selects 0
    run(constV(1 to 16: _*),
      constV(Seq(200) ++ Seq.fill(15)(0): _*), SimdOp(256),
      SimdLane(22, 0)) shouldBe 0L
    // relaxed_q15mulr_s: rounding fixed-point, 16384² -> 8192
    run(I32Const(16384), SimdOp(16), I32Const(16384), SimdOp(16),
      SimdOp(273), SimdLane(24, 0)) shouldBe 8192L
    // relaxed_dot (signed i8 pairs, sat i16): 3·5 + 3·5 = 30
    run(constV(Seq.fill(16)(3): _*), constV(Seq.fill(16)(5): _*),
      SimdOp(274), SimdLane(24, 0)) shouldBe 30L
    // relaxed_dot_add: 30 + 30 + c(100) = 160 per i32 lane
    run(constV(Seq.fill(16)(3): _*), constV(Seq.fill(16)(5): _*),
      I32Const(100), SimdOp(17), SimdOp(275),
      SimdLane(27, 3)) shouldBe 160L
  }

  test("reference-types execution: null refs, func refs, table get/set/" +
      "grow/size/fill/copy/init/drop, typed select, multi-table, " +
      "ref-local null default — through the binary codec") {
    val t0 = FuncType(Vector(ValType.I64), Vector(ValType.I64))
    val t1 = FuncType(Vector(), Vector(ValType.I64))
    val t2 = FuncType(Vector(ValType.I32, ValType.I64), Vector(ValType.I64))
    val t3 = FuncType(Vector(), Vector(ValType.I32)) // i32-producing bodies
    def f(body: Instr*) = FuncBody(Vector(), body.toVector)
    val m = WasmModule(
      types = Vector(t0, t1, t2, t3),
      imports = Vector.empty,
      funcTypeIdxs = Vector(0, 0, 3, 3, 3, 1, 1, 1, 3, 3, 2),
      memMinPages = 1, memMaxPages = None,
      globals = Vector(
        WasmGlobal(ValType.Funcref, mutable = false, Vector(RefFunc(1)))),
      exports = Vector(
        WasmExport("refops", 0, 2), WasmExport("localdef", 0, 3),
        WasmExport("growsize", 0, 4), WasmExport("fillcopy", 0, 5),
        WasmExport("initcall", 0, 6), WasmExport("initdropped", 0, 7),
        WasmExport("tsel", 0, 8), WasmExport("xref", 0, 9),
        WasmExport("dispatch", 0, 10)),
      codes = Vector(
        // 0: +10, 1: +20 — the dispatch targets
        FuncBody(Vector(), Vector(LocalGet(0), I64Const(10), Num(0x7C))),
        FuncBody(Vector(), Vector(LocalGet(0), I64Const(20), Num(0x7C))),
        // (is_null(null) << 1) | is_null(ref.func 0) = 2
        f(RefNull(0x70), RefIsNull, I32Const(1), Num(0x74),
          RefFunc(0), RefIsNull, Num(0x72)),
        // a funcref local defaults to NULL, not func-index 0
        FuncBody(Vector(ValType.Funcref), Vector(LocalGet(0), RefIsNull)),
        // grow(+2, null) returns old size 4; size then reads 6 → 406
        f(RefNull(0x70), I32Const(2), TableGrow(0), I32Const(100),
          Num(0x6C), TableSize(0), Num(0x6A)),
        // fill [0,3) with f1, copy slot0→3, call slot 3: 5+20 = 25
        f(I32Const(0), RefFunc(1), I32Const(3), TableFill(0),
          I32Const(3), I32Const(0), I32Const(1), TableCopy(0, 0),
          I64Const(5), I32Const(3), CallIndirect(0)),
        // init [2,4) from the passive seg [f1,f0], call slot 2: 1+20
        f(I32Const(2), I32Const(0), I32Const(2), TableInit(1, 0),
          I64Const(1), I32Const(2), CallIndirect(0)),
        // elem.drop then a len-1 init from the dropped segment traps
        f(ElemDrop(1), I32Const(0), I32Const(0), I32Const(1),
          TableInit(1, 0), I64Const(0)),
        // typed select picks by condition: 10·is_null(sel c=1) +
        // is_null(sel c=0) = 10·0 + 1
        f(RefFunc(0), RefNull(0x70), I32Const(1),
          SelectT(Vector(ValType.Funcref)), RefIsNull,
          I32Const(10), Num(0x6C),
          RefFunc(0), RefNull(0x70), I32Const(0),
          SelectT(Vector(ValType.Funcref)), RefIsNull, Num(0x6A)),
        // the externref table: size 2, slot 0 starts null → 21
        f(TableSize(1), I32Const(10), Num(0x6C), I32Const(0),
          TableGet(1), RefIsNull, Num(0x6A)),
        FuncBody(Vector(), Vector(LocalGet(1), LocalGet(0),
          CallIndirect(0)))),
      datas = Vector.empty, start = None,
      tables = Vector(TableType(ValType.Funcref, 4, None),
        TableType(ValType.Externref, 2, Some(8))),
      elems = Vector(ElemSeg(0, Vector(0, 1)),
        ElemSeg(-1, Vector(1, 0), mode = 1)))
    val inst = new WasmInterp.Instance(
      WasmBinary.decode(WasmBinary.encode(m)), Map.empty)
    inst.invoke("refops").head shouldBe 2L
    inst.invoke("localdef").head shouldBe 1L
    inst.invoke("dispatch", 0L, 7L).head shouldBe 17L // before fill clobbers
    inst.invoke("dispatch", 1L, 7L).head shouldBe 27L
    inst.invoke("growsize").head shouldBe 406L
    inst.invoke("fillcopy").head shouldBe 25L
    inst.invoke("initcall").head shouldBe 21L
    inst.invoke("tsel").head shouldBe 1L
    inst.invoke("xref").head shouldBe 21L
    val eD = intercept[WasmTrap](inst.invoke("initdropped"))
    assert(eD.getMessage.contains("table.init"))
  }

  test("simd128 lane immediates validate at DECODE time: shuffle lanes " +
      "< 32, extract/replace and load/store lanes bounded per shape") {
    // r13 advice: unvalidated lane immediates surfaced as raw
    // ArrayIndexOutOfBounds at EXECUTION; the fuzz contract wants the
    // named WasmDecodeError at decode, like every other rejection.
    val header = Array[Byte](0x00, 0x61, 0x73, 0x6D, 0x01, 0x00, 0x00, 0x00)
    def sec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 128)
      Array(id.toByte, payload.length.toByte) ++ payload
    }
    val voidType = sec(1, Array[Byte](0x01, 0x60, 0x00, 0x00))
    val oneFunc = sec(3, Array[Byte](0x01, 0x00))
    def withBody(body: Array[Byte]): Array[Byte] = {
      val code = Array[Byte](0x01, (body.length + 1).toByte, 0x00) ++ body
      header ++ voidType ++ oneFunc ++ sec(10, code)
    }
    def outOfRange(body: Array[Byte]): Unit = {
      val e = intercept[WasmDecodeError](WasmBinary.decode(withBody(body)))
      assert(e.getMessage.contains("out of range"), e.getMessage)
    }
    // i8x16.shuffle with one lane = 32
    outOfRange(Array[Byte](0xFD.toByte, 13) ++ Array.fill[Byte](15)(0) ++
      Array[Byte](32, 0x0B))
    // i8x16.extract_lane_s lane 16
    outOfRange(Array[Byte](0xFD.toByte, 21, 16, 0x0B))
    // i64x2.replace_lane lane 2
    outOfRange(Array[Byte](0xFD.toByte, 30, 2, 0x0B))
    // v128.load8_lane lane 16 (align 0, offset 0)
    outOfRange(Array[Byte](0xFD.toByte, 84, 0, 0, 16, 0x0B))
    // boundary lanes still decode (15 for i8x16, 31 for shuffle)
    WasmBinary.decode(withBody(Array[Byte](0xFD.toByte, 21, 15, 0x0B)))
    WasmBinary.decode(withBody(
      Array[Byte](0xFD.toByte, 13) ++ Array.fill[Byte](16)(31) ++
        Array[Byte](0x0B)))
  }

  test("multi-v128-result compaction snapshots before writing: a " +
      "low-handle second result survives the first result's copy") {
    // g returns (B, A) where A sits AT the pool watermark and B above
    // it: compaction writes B into A's slot first, so without the
    // snapshot the caller reads (B, B) — the r13 advice clobber shape.
    val a = SimdConst(5.toByte +: Vector.fill(15)(0.toByte))
    val b = SimdConst(7.toByte +: Vector.fill(15)(0.toByte))
    val g = FuncBody(Vector(ValType.V128),
      Vector(a, LocalSet(0), b, LocalGet(0)))
    // f: call g, fold the two i64 lane-0 values as b*100 + a
    val f = FuncBody(Vector(ValType.I64), Vector(
      Call(0),
      SimdLane(29, 0), LocalSet(0), // top of stack is A
      SimdLane(29, 0),              // then B
      I64Const(100), Num(0x7E),     // i64.mul
      LocalGet(0), Num(0x7C)))      // i64.add
    val m = WasmModule(
      types = Vector(
        FuncType(Vector(), Vector(ValType.V128, ValType.V128)),
        FuncType(Vector(), Vector(ValType.I64))),
      imports = Vector.empty,
      funcTypeIdxs = Vector(0, 1),
      memMinPages = 1, memMaxPages = None,
      globals = Vector.empty,
      exports = Vector(WasmExport("f", 0, 1)),
      codes = Vector(g, f),
      datas = Vector.empty, start = None)
    run1(m, "f") shouldBe 705L
  }

  test("simd128 tier: lane arithmetic, comparisons, bitmask, shifts, " +
      "saturation, shuffle/swizzle, memory and lane ops, float lanes, " +
      "conversions - each checked against scalar-computed lanes") {
    import WasmInterp.Instance
    // harness: build vectors, compute, extract — the declared result
    // type follows the final instruction (validation is real now)
    def run(locals: Vector[Byte], body: Instr*): Long = {
      val rt = body.last match {
        case SimdLane(29, _) => ValType.I64
        case SimdLane(31, _) => ValType.F32
        case SimdLane(33, _) => ValType.F64
        case _: SimdLane => ValType.I32
        case SimdOp(83) | SimdOp(99) | SimdOp(100) => ValType.I32
        case _ => ValType.I64
      }
      val m = func(Vector(), Vector(rt), locals, body: _*)
      new Instance(WasmBinary.decode(WasmBinary.encode(m)), Map.empty)
        .invoke("f").head
    }
    def constV(bytes: Int*): Instr = SimdConst(bytes.map(_.toByte).toVector)
    val oneToSixteen = constV(1 to 16: _*)

    // i8x16.add with saturating sibling: 250 + 10 wraps vs saturates
    val bigBytes = constV(Seq.fill(16)(250): _*)
    val tens = constV(Seq.fill(16)(10): _*)
    run(Vector(), bigBytes, tens, SimdOp(110), SimdLane(22, 0)) shouldBe 4L
    run(Vector(), bigBytes, tens, SimdOp(112), SimdLane(22, 0)) shouldBe 255L
    // i8x16 signed saturation: 120 + 100 -> 127
    val p120 = constV(Seq.fill(16)(120): _*)
    val p100 = constV(Seq.fill(16)(100): _*)
    run(Vector(), p120, p100, SimdOp(111), SimdLane(21, 3)) shouldBe 127L

    // i32x4: splat, mul, extract
    run(Vector(), I32Const(7), SimdOp(17), I32Const(-3), SimdOp(17),
      SimdOp(181), SimdLane(27, 2)) shouldBe -21L
    // i64x2: splat, add, extract lane 1
    run(Vector(), I64Const(1L << 40), SimdOp(18), I64Const(5), SimdOp(18),
      SimdOp(206), SimdLane(29, 1)) shouldBe (1L << 40) + 5L

    // comparisons produce all-ones lanes; bitmask collects sign bits
    run(Vector(), oneToSixteen, constV(Seq.fill(16)(8): _*),
      SimdOp(39) /* i8x16.gt_s */, SimdOp(100) /* bitmask */) shouldBe
      0xFF00L // lanes 8..15 hold 9..16 > 8
    // all_true / any_true
    run(Vector(), oneToSixteen, SimdOp(99)) shouldBe 1L
    run(Vector(), constV(Seq.fill(16)(0): _*), SimdOp(83)) shouldBe 0L

    // shifts: i16x8.shl by 3 then shr_u back
    run(Vector(), I32Const(5), SimdOp(16), I32Const(3), SimdOp(139),
      I32Const(3), SimdOp(141), SimdLane(25, 7)) shouldBe 5L
    // i32x4.shr_s keeps the sign
    run(Vector(), I32Const(-64), SimdOp(17), I32Const(4), SimdOp(172),
      SimdLane(27, 0)) shouldBe -4L

    // shuffle reverses; swizzle indexes (OOB lane -> 0)
    run(Vector(), oneToSixteen, oneToSixteen,
      SimdShuffle((15 to 0 by -1).toVector), SimdLane(22, 0)) shouldBe 16L
    run(Vector(), oneToSixteen, constV(1, 0, 255, 3, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0), SimdOp(14), SimdLane(22, 2)) shouldBe 0L

    // not/and/or/xor/andnot/bitselect
    run(Vector(), constV(Seq.fill(16)(0xF0): _*), SimdOp(77),
      SimdLane(22, 5)) shouldBe 0x0FL
    run(Vector(), constV(Seq.fill(16)(0xCC): _*),
      constV(Seq.fill(16)(0xAA): _*), SimdOp(81) /* v128.xor */,
      SimdLane(22, 0)) shouldBe (0xCC ^ 0xAA).toLong
    run(Vector(), constV(Seq.fill(16)(0xCC): _*),
      constV(Seq.fill(16)(0xAA): _*), SimdOp(79) /* v128.andnot */,
      SimdLane(22, 0)) shouldBe (0xCC & ~0xAA & 0xFF).toLong
    run(Vector(), constV(Seq.fill(16)(0b1100): _*),
      constV(Seq.fill(16)(0b1010): _*), constV(Seq.fill(16)(0b0110): _*),
      SimdOp(82), SimdLane(22, 0)) shouldBe 0b1100L // (a&c)|(b&~c) = 4|8

    // v128.load / store round-trip through linear memory
    run(Vector(ValType.V128),
      oneToSixteen, LocalSet(0),
      I32Const(128), LocalGet(0), SimdMem(11, 0, 0), // store
      I32Const(128), SimdMem(0, 0, 0), // load
      SimdLane(22, 9)) shouldBe 10L
    // load32_splat + load64_zero + lane load
    run(Vector(),
      I32Const(64), I32Const(0x01020304), MemStore(0x36, 0, 0), // i32.store
      I32Const(64), SimdMem(9, 0, 0), SimdLane(27, 3)) shouldBe 0x01020304L
    run(Vector(),
      I32Const(64), I64Const(-1L), MemStore(0x37, 0, 0),
      I32Const(64), SimdMem(93, 0, 0), SimdLane(29, 1)) shouldBe 0L
    run(Vector(ValType.V128),
      oneToSixteen, LocalSet(0),
      I32Const(64), I32Const(0x55), MemStore(0x3A, 0, 0), // i32.store8
      I32Const(64), LocalGet(0), SimdMemLane(84, 0, 0, 4),
      SimdLane(22, 4)) shouldBe 0x55L

    // extend / narrow / dot
    run(Vector(), constV((1 to 16).map(_ => 200): _*),
      SimdOp(137) /* i16x8.extend_low_i8x16_u */,
      SimdLane(25, 0)) shouldBe 200L
    run(Vector(), I32Const(70000), SimdOp(17), I32Const(70000), SimdOp(17),
      SimdOp(133) /* i16x8.narrow_i32x4_s saturates */,
      SimdLane(24, 0)) shouldBe 32767L
    run(Vector(), I32Const(3), SimdOp(16), I32Const(4), SimdOp(16),
      SimdOp(186) /* dot: 3*4 + 3*4 per i32 lane */,
      SimdLane(27, 1)) shouldBe 24L

    // float lanes: f32x4 arithmetic + trunc_sat + convert
    val f2_5 = java.lang.Float.floatToRawIntBits(2.5f)
    run(Vector(), F32Const(f2_5), SimdOp(19), // f32x4.splat(2.5)
      F32Const(f2_5), SimdOp(19), SimdOp(230), // mul -> 6.25
      SimdOp(248), SimdLane(27, 0)) shouldBe 6L // trunc_sat_s
    run(Vector(), I32Const(-7), SimdOp(17), SimdOp(250), // convert_i32x4_s
      SimdOp(224), // f32x4.abs
      SimdOp(248), SimdLane(27, 2)) shouldBe 7L
    // f64x2: splat via convert_low, add, extract bits
    val d = run(Vector(), I32Const(3), SimdOp(17), SimdOp(254), // f64x2 (3.0, 3.0)
      I32Const(4), SimdOp(17), SimdOp(254), SimdOp(240), // + (4,4)
      SimdLane(33, 1))
    java.lang.Double.longBitsToDouble(d) shouldBe 7.0

    // widening family: extmul low/high s/u, extadd_pairwise, q15mulr
    // i16x8.extmul_low_i8x16_s: lane 0 = 1*1 = 1; lane 7 = 8*8 = 64
    run(Vector(), oneToSixteen, oneToSixteen, SimdOp(156),
      SimdLane(24, 7)) shouldBe 64L
    // extmul_high_i8x16_u of 200s: 200*200 = 40000 (unsigned, no wrap)
    val twoHundreds = constV(Seq.fill(16)(200): _*)
    run(Vector(), twoHundreds, twoHundreds, SimdOp(159),
      SimdLane(25, 0)) shouldBe 40000L
    // extmul_high_i8x16_s: (-56) * (-56) = 3136
    run(Vector(), twoHundreds, twoHundreds, SimdOp(157),
      SimdLane(24, 3)) shouldBe 3136L
    // i64x2.extmul_low_i32x4_s: (-70000)^2 overflows i32, exact in i64
    run(Vector(), I32Const(-70000), SimdOp(17), I32Const(-70000), SimdOp(17),
      SimdOp(220), SimdLane(29, 1)) shouldBe 4900000000L
    // i16x8.extadd_pairwise_i8x16_s over 1..16: lane 0 = 1+2 = 3
    run(Vector(), oneToSixteen, SimdOp(124), SimdLane(24, 0)) shouldBe 3L
    // _u over 200s: 400 per lane
    run(Vector(), twoHundreds, SimdOp(125), SimdLane(25, 7)) shouldBe 400L
    // i32x4.extadd_pairwise_i16x8_u: two 40000s -> 80000
    run(Vector(), twoHundreds, twoHundreds, SimdOp(159), SimdOp(127),
      SimdLane(27, 0)) shouldBe 80000L
    // q15mulr_sat_s: 16384 (0.5 in Q15) squared -> 8192 (0.25);
    // -32768 * -32768 saturates to 32767
    run(Vector(), I32Const(16384), SimdOp(16), I32Const(16384), SimdOp(16),
      SimdOp(130), SimdLane(24, 2)) shouldBe 8192L
    run(Vector(), I32Const(-32768), SimdOp(16), I32Const(-32768), SimdOp(16),
      SimdOp(130), SimdLane(24, 0)) shouldBe 32767L
  }

  test("sign-extension operators (emitted by LLVM by default)") {
    val m = func(Vector(ValType.I32), Vector(ValType.I32), Vector(),
      LocalGet(0), Num(0xC0)) // i32.extend8_s
    run1(m, "f", 0x80L) shouldBe -128L
    run1(m, "f", 0x7FL) shouldBe 127L
    val m64 = func(Vector(ValType.I64), Vector(ValType.I64), Vector(),
      LocalGet(0), Num(0xC4)) // i64.extend32_s
    run1(m64, "f", 0xFFFFFFFFL) shouldBe -1L
  }

  test("saturating truncation matrix (0xFC 0-7): NaN -> 0, clamps, no traps") {
    // each sub-op as f(bits) -> int; f64 input variants take raw f64 bits,
    // f32 variants take raw f32 bits in the low word
    def sat64(sub: Int, d: Double): Long = run1(
      func(Vector(ValType.F64), Vector(
        if (sub >= 4) ValType.I64 else ValType.I32), Vector(),
        LocalGet(0), TruncSat(sub)),
      "f", java.lang.Double.doubleToRawLongBits(d))
    def sat32(sub: Int, fl: Float): Long = run1(
      func(Vector(ValType.F32), Vector(
        if (sub >= 4) ValType.I64 else ValType.I32), Vector(),
        LocalGet(0), TruncSat(sub)),
      "f", java.lang.Float.floatToRawIntBits(fl).toLong & 0xFFFFFFFFL)

    // i32.trunc_sat_f64_s (2): in-range, truncation toward zero, clamps, NaN
    sat64(2, 41.9) shouldBe 41L
    sat64(2, -41.9) shouldBe -41L
    sat64(2, 1e12) shouldBe Int.MaxValue.toLong
    sat64(2, -1e12) shouldBe Int.MinValue.toLong
    sat64(2, Double.PositiveInfinity) shouldBe Int.MaxValue.toLong
    sat64(2, Double.NegativeInfinity) shouldBe Int.MinValue.toLong
    sat64(2, Double.NaN) shouldBe 0L
    // i32.trunc_sat_f64_u (3): negative -> 0, above 2^32-1 clamps (the
    // stack's i32 slot is sign-extended, so 0xFFFFFFFF reads back as -1)
    sat64(3, -5.0) shouldBe 0L
    sat64(3, 3e9) shouldBe 3000000000L.toInt.toLong
    sat64(3, 1e12) shouldBe -1L
    sat64(3, Double.NaN) shouldBe 0L
    // i64.trunc_sat_f64_s (6): clamps at the i64 bounds
    sat64(6, 1e30) shouldBe Long.MaxValue
    sat64(6, -1e30) shouldBe Long.MinValue
    sat64(6, -41.9) shouldBe -41L
    sat64(6, Double.NaN) shouldBe 0L
    // i64.trunc_sat_f64_u (7): full-width unsigned, raw bits on the stack
    sat64(7, -1.0) shouldBe 0L
    sat64(7, 1e19) shouldBe java.lang.Long.parseUnsignedLong("10000000000000000000")
    sat64(7, 1e30) shouldBe -1L // 0xFFFFFFFFFFFFFFFF
    // the 2^63 boundary: Double.toLong would saturate to 2^63-1; the
    // spec result is exactly 2^63 = raw bits 0x8000000000000000
    sat64(7, 9.223372036854775808e18) shouldBe Long.MinValue
    run1(func(Vector(ValType.F64), Vector(ValType.I64), Vector(),
      LocalGet(0), Num(0xB1)), // trapping i64.trunc_f64_u, same boundary
      "f", java.lang.Double.doubleToRawLongBits(9.223372036854775808e18)
    ) shouldBe Long.MinValue
    // f32-sourced variants (0, 1, 4, 5)
    sat32(0, 41.9f) shouldBe 41L
    sat32(0, Float.NegativeInfinity) shouldBe Int.MinValue.toLong
    sat32(1, -1.0f) shouldBe 0L
    sat32(1, 1e12f) shouldBe -1L
    sat32(4, 1e30f) shouldBe Long.MaxValue
    sat32(5, Float.NaN) shouldBe 0L
    sat32(5, 1e30f) shouldBe -1L
    // binary round-trip: the decoder reads 0xFC subops back as TruncSat
    val m = func(Vector(ValType.F64), Vector(ValType.I64), Vector(),
      LocalGet(0), TruncSat(6))
    WasmBinary.decode(WasmBinary.encode(m)) shouldBe m
  }

  test("float matrix: rounding modes, copysign, conversions, trunc traps") {
    def f64op(ops: Instr*): Double = java.lang.Double.longBitsToDouble(
      run1(func(Vector(ValType.F64), Vector(ValType.F64), Vector(),
        (LocalGet(0) +: ops): _*), "f",
        java.lang.Double.doubleToRawLongBits(-2.5)))
    f64op(Num(0x9B)) shouldBe -2.0 // ceil
    f64op(Num(0x9C)) shouldBe -3.0 // floor
    f64op(Num(0x9D)) shouldBe -2.0 // trunc toward zero
    f64op(Num(0x9E)) shouldBe -2.0 // nearest, ties to even
    java.lang.Double.longBitsToDouble(run1(
      func(Vector(ValType.F64, ValType.F64), Vector(ValType.F64), Vector(),
        LocalGet(0), LocalGet(1), Num(0xA6)), "f",
      java.lang.Double.doubleToRawLongBits(3.0),
      java.lang.Double.doubleToRawLongBits(-0.0))) shouldBe -3.0 // copysign
    // i64.trunc_f64_s
    run1(func(Vector(ValType.F64), Vector(ValType.I64), Vector(),
      LocalGet(0), Num(0xB0)), "f",
      java.lang.Double.doubleToRawLongBits(-7.9)) shouldBe -7L
    // f64.convert_i64_u of a negative (high-bit) long
    java.lang.Double.longBitsToDouble(run1(
      func(Vector(ValType.I64), Vector(ValType.F64), Vector(),
        LocalGet(0), Num(0xBA)), "f", -1L)) shouldBe 1.8446744073709552e19
    // NaN and out-of-range truncations trap per spec
    a[WasmTrap] should be thrownBy run1(
      func(Vector(ValType.F64), Vector(ValType.I32), Vector(),
        LocalGet(0), Num(0xAA)), "f",
      java.lang.Double.doubleToRawLongBits(Double.NaN))
    a[WasmTrap] should be thrownBy run1(
      func(Vector(ValType.F64), Vector(ValType.I32), Vector(),
        LocalGet(0), Num(0xAA)), "f",
      java.lang.Double.doubleToRawLongBits(3e10))
  }

  test("float identity gauntlet edges: NaN, ±0, and nearest-ties survive " +
      "the shiftGuest float path's op sequence as the spec demands") {
    // the exact op sequence the viaFloatPath guest runs on its sum:
    // neg∘neg -> ×1.0 -> copysign(abs(x), x) — identity for every f64
    // input INCLUDING -0.0 and NaN payload sign
    def gauntlet(bits: Long): Long = run1(
      func(Vector(ValType.F64), Vector(ValType.F64), Vector(ValType.F64),
        LocalGet(0),
        Num(0x9A), Num(0x9A),
        F64Const(java.lang.Double.doubleToRawLongBits(1.0)), Num(0xA2),
        LocalTee(1), Num(0x99), LocalGet(1), Num(0xA6)), "f", bits)
    val negZero = java.lang.Double.doubleToRawLongBits(-0.0)
    gauntlet(negZero) shouldBe negZero // -0.0 ×1.0 keeps its sign
    val pi = java.lang.Double.doubleToRawLongBits(math.Pi)
    gauntlet(pi) shouldBe pi
    // NaN: ×1.0 must still be a NaN (exact payload is impl-defined per
    // spec; the JVM canonicalizes — assert NaN-ness, not bits)
    java.lang.Double.longBitsToDouble(gauntlet(
      java.lang.Double.doubleToRawLongBits(Double.NaN))).isNaN shouldBe true
    // trunc_sat at the gauntlet exit: NaN -> 0, ±huge clamps, -0.0 -> 0
    def sat(d: Double): Long = run1(
      func(Vector(ValType.F64), Vector(ValType.I64), Vector(),
        LocalGet(0), TruncSat(6)), "f",
      java.lang.Double.doubleToRawLongBits(d))
    sat(Double.NaN) shouldBe 0L
    sat(-0.0) shouldBe 0L
    sat(1e300) shouldBe Long.MaxValue
    sat(-1e300) shouldBe Long.MinValue
    sat(2.5) shouldBe 2L // trunc toward zero, not nearest
    sat(-2.5) shouldBe -2L
    // f64.convert_i64_s at 2^53 boundary stays exact; 2^53+1 rounds even
    def conv(v: Long): Double = java.lang.Double.longBitsToDouble(run1(
      func(Vector(ValType.I64), Vector(ValType.F64), Vector(),
        LocalGet(0), Num(0xB9)), "f", v))
    conv(1L << 53) shouldBe 9007199254740992.0
    conv((1L << 53) + 1L) shouldBe 9007199254740992.0 // ties-to-even
  }

  test("traps: unreachable, division by zero, out-of-bounds access") {
    val unreachable = func(Vector(), Vector(), Vector(), Unreachable)
    a[WasmTrap] should be thrownBy run1(unreachable, "f")
    val div0 = func(Vector(), Vector(ValType.I32), Vector(),
      I32Const(1), I32Const(0), Num(0x6D))
    the[WasmTrap] thrownBy run1(div0, "f") should have message "integer divide by zero"
    val oob = func(Vector(), Vector(ValType.I32), Vector(),
      I32Const(1 << 20), MemLoad(0x28, 2, 0))
    a[WasmTrap] should be thrownBy run1(oob, "f")
  }

  // ---------- lens guests over the real ABI ----------

  private def drive(guest: WasmGuest, inputs: Seq[String]): Seq[String] = {
    val t = guest.open()
    var src = inputs.toList
    val pull: () => Option[Array[Byte]] = () => src match {
      case h :: rest => src = rest; Some(h.getBytes(UTF_8))
      case Nil => None
    }
    val out = Vector.newBuilder[String]
    var eos = false
    while (!eos) t(pull) match {
      case Some(b) => out += new String(b, UTF_8)
      case None => eos = true
    }
    out.result()
  }

  private def shift(delta: Long) = new WasmGuest(
    LensGuestModules.shiftGuest("value"), "transform",
    Some(s"""{"delta":$delta}""".getBytes(UTF_8)), identity)

  test("shift guest adds delta to the named field, preserving the rest") {
    drive(shift(5), Seq(
      """{"value":41,"name":"x"}""",
      """{"value":-3,"name":"y"}""",
      """{"name":"z","value":0}""")) shouldBe Seq(
      """{"value":46,"name":"x"}""",
      """{"value":2,"name":"y"}""",
      """{"name":"z","value":5}""")
  }

  test("shift guest inverse subtracts — forward then inverse is identity") {
    val fwd = shift(7)
    val inv = fwd.inverseGuest.get
    val items = Seq("""{"value":100}""", """{"value":-50}""")
    drive(inv.asInstanceOf[WasmGuest], drive(fwd, items)) shouldBe items
  }

  test("shift guest without set_param errors with the reference's message") {
    val g = new WasmGuest(LensGuestModules.shiftGuest("value"), "transform",
      None, identity)
    val e = the[RuntimeException] thrownBy drive(g, Seq("""{"value":1}"""))
    e.getMessage shouldBe "Parameters have not been set."
  }

  test("shift guest errors in-band when the field is absent") {
    val e = the[RuntimeException] thrownBy drive(shift(1), Seq("""{"other":1}"""))
    e.getMessage shouldBe "field 'value' not found"
  }

  test("set_param without the expected key fails at configure time") {
    val g = new WasmGuest(LensGuestModules.shiftGuest("value"), "transform",
      Some("""{"unrelated":1}""".getBytes(UTF_8)), identity)
    val e = the[IllegalArgumentException] thrownBy g.open()
    e.getMessage should include("parameter 'delta' missing")
  }

  test("filter guest pulls past rejected items (1:<=1 len change)") {
    val g = new WasmGuest(LensGuestModules.filterGuest("value"), "transform",
      Some("""{"min":10}""".getBytes(UTF_8)), identity)
    drive(g, Seq(
      """{"value":5}""", """{"value":15}""", """{"value":9}""",
      """{"value":10}""", """{"value":-2}""")) shouldBe Seq(
      """{"value":15}""", """{"value":10}""")
    g.inverseGuest shouldBe None // module compiled without the export
  }

  test("repeat guest emits each item k times from its buffered state (1:N)") {
    val g = new WasmGuest(LensGuestModules.repeatGuest(), "transform",
      Some("""{"times":3}""".getBytes(UTF_8)), identity)
    drive(g, Seq("""{"a":1}""", """{"a":2}""")) shouldBe Seq(
      """{"a":1}""", """{"a":1}""", """{"a":1}""",
      """{"a":2}""", """{"a":2}""", """{"a":2}""")
  }

  test("rename guest splices the key bytes; inverse renames back (T1/T4)") {
    val g = new WasmGuest(LensGuestModules.renameGuest("Name", "FullName"),
      "transform", None, identity)
    drive(g, Seq("""{"Age":21,"Name":"John"}""")) shouldBe
      Seq("""{"Age":21,"FullName":"John"}""")
    val inv = g.inverseGuest.get.asInstanceOf[WasmGuest]
    drive(inv, Seq("""{"Age":21,"FullName":"John"}""")) shouldBe
      Seq("""{"Age":21,"Name":"John"}""")
    val e = the[RuntimeException] thrownBy drive(g, Seq("""{"Age":21}"""))
    e.getMessage shouldBe "The requested property was not found"
  }

  test("normalize guest explodes Book pages into buffered Page items (T6)") {
    val g = new WasmGuest(LensGuestModules.normalizeGuest(), "transform",
      None, identity)
    // the reference's books fixture: 1:N with a pending queue, an empty
    // array yields nothing downstream (its Nil is dropped at the sink)
    drive(g, Seq(
      """{"Name":"A","PageNumbers":[1,2]}""",
      """{"Name":"B","PageNumbers":[]}""",
      """{"Name":"C","PageNumbers":[7]}""")) shouldBe Seq(
      """{"BookName":"A","Number":1}""",
      """{"BookName":"A","Number":2}""",
      """{"BookName":"C","Number":7}""")
    // negative elements and state across many books
    drive(g, Seq("""{"Name":"D","PageNumbers":[-3,10,-1]}""")) shouldBe Seq(
      """{"BookName":"D","Number":-3}""",
      """{"BookName":"D","Number":10}""",
      """{"BookName":"D","Number":-1}""")
  }

  test("counter guest advances mutable guest state across transform calls (T7)") {
    val g = new WasmGuest(LensGuestModules.counterGuest("id"), "transform",
      None, identity)
    drive(g, Seq(
      """{"id":0,"n":"a"}""", """{"id":0,"n":"b"}""",
      """{"id":0,"n":"c"}""")) shouldBe Seq(
      """{"id":1,"n":"a"}""", """{"id":2,"n":"b"}""", """{"id":3,"n":"c"}""")
    // a fresh open() is a fresh instance: state does not leak
    drive(g, Seq("""{"id":9}""")) shouldBe Seq("""{"id":1}""")
  }

  test("guest memory stays bounded across many items (allocator resets)") {
    val g = shift(1)
    val t = g.open()
    // 10k items through one instance; the bump allocator must not creep
    var i = 0
    val pull: () => Option[Array[Byte]] = () =>
      if (i < 10000) { i += 1; Some(s"""{"value":$i}""".getBytes(UTF_8)) }
      else None
    var n = 0
    while (t(pull).isDefined) n += 1
    n shouldBe 10000
    // two 64KiB pages were declared; bounded reuse means no growth happened
    // beyond at most one extra page
    // (access via a fresh open() is a new instance; the assertion is the
    // successful completion above — a leak of ~20 bytes/item over 10k items
    // inside 128KiB would have trapped or grown unboundedly)
  }
}
