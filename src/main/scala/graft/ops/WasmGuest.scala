package graft.ops

import graft.wasm.{LensGuestModules, WasmInterp}
import org.apache.spark.sql.types.StructType

/**
 * P5 — REAL WebAssembly guest execution behind the [[PullBytesGuest]]
 * seam.
 *
 * This is the reference's host/guest contract executed for actual wasm
 * bytecode (reference: host-go/runtimes/wasmtime/runtime.go:164-227):
 *
 *  - instantiate: bind the `lens.next` import, call `set_param` with the
 *    JSON-framed parameters if any were configured (runtime.go:118-152);
 *  - one `Transform(next)` call per output item: the host assigns the
 *    CURRENT pull callback immediately before invoking `transform`
 *    (runtime.go:192-205 — what lets consecutive stages share one
 *    instance), the guest pulls zero or more inputs through `next`
 *    (each one written into guest memory at a guest-`alloc`ed offset,
 *    re-entering the interpreter), and the returned i32 is the offset
 *    of the output frame in guest linear memory;
 *  - frames are `[i8 typeId][u32 LE len][bytes]` with Err=-1, Nil=0,
 *    JSON=1, EOS=127 (host-go/engine/pipes/protocol.go:31-89).
 *
 * Error frames surface as exceptions carrying the guest's message —
 * OpaqueOp's permissive mode turns them into in-band `__error` rows
 * exactly as for JVM guests. Nil frames are forwarded downstream as the
 * reference's pipes do (a nil is NOT end-of-stream —
 * host-go/engine/module/protocol.go:44); the partition adapter skips
 * them, matching how the CLI sink drops nils from output.
 *
 * 100 TB shape: module bytes (a few KB) ship in the task closure; decode
 * is once per executor (content-hash cache), instantiation once per
 * partition, execution pure per-partition compute with zero shuffles
 * added. Guest memory is bounded by the module's own allocator
 * discipline (see [[graft.wasm.LensGuestModules]] — heap resets once
 * per item), so a 10⁹-row partition scan holds one item's frames.
 */
final class WasmGuest(
    moduleBytes: Array[Byte],
    fnName: String,
    paramsJson: Option[Array[Byte]],
    schemaFn: StructType => StructType)
  extends PullBytesGuest {

  override def outputSchema(in: StructType): StructType = schemaFn(in)

  override def configured(params: Option[Array[Byte]]): PullBytesGuest =
    new WasmGuest(moduleBytes, fnName, params, schemaFn)

  override def inverseGuest: Option[PullBytesGuest] =
    if (WasmInterp.moduleOf(moduleBytes).export("inverse").isDefined)
      Some(new WasmGuest(moduleBytes, "inverse", paramsJson, schemaFn))
    else None

  override def open(): (() => Option[Array[Byte]]) => Option[Array[Byte]] =
    openShared(1).head

  /** One interpreter instance, `times` transform drivers — consecutive
   *  fused stages all mutate the SAME guest memory/globals, the
   *  reference's shared-instance contract (runtime.go:192-205). The pull
   *  slot is saved/restored around each invoke, so a downstream stage's
   *  re-entrant pull through an upstream stage cannot leave the slot
   *  pointing at the wrong source (the reference's single-assignment slot
   *  relies on one-pull-per-transform guests; stack discipline makes
   *  multi-pull guests safe too without changing observable behavior). */
  override def openShared(times: Int)
      : Seq[(() => Option[Array[Byte]]) => Option[Array[Byte]]] = {
    var nextFn: () => Option[Array[Byte]] = () => None

    var inst: WasmInterp.Instance = null
    inst = WasmInterp.instantiate(moduleBytes, Map(
      ("lens", "next") -> { _ =>
        Vector(WasmGuest.writeFrame(inst, nextFn()).toLong)
      }))

    require(inst.hasExport("transform"),
      "wasm guest: export `transform` does not exist")
    if (fnName != "transform") require(inst.hasExport(fnName),
      s"wasm guest: export `$fnName` does not exist")

    // set_param applies once per instance, exactly as the reference's
    // NewInstance does before any transform runs (runtime.go:118-152).
    paramsJson.foreach { bytes =>
      val at = WasmGuest.writeFrame(inst, Some(bytes))
      val out = inst.invoke("set_param", at.toLong).head.toInt
      WasmGuest.readFrame(inst, out) match {
        case WasmGuest.ErrFrame(msg) => throw new IllegalArgumentException(
          s"wasm guest set_param failed: $msg")
        case _ => // Nil/JSON ack
      }
    }

    Seq.fill(times) { pull =>
      val saved = nextFn
      nextFn = pull
      try {
        var result: Option[Array[Byte]] = null
        while (result == null) {
          val at = inst.invoke(fnName).head.toInt
          WasmGuest.readFrame(inst, at) match {
            case WasmGuest.JsonFrame(bytes) => result = Some(bytes)
            case WasmGuest.EosFrame => result = None
            case WasmGuest.ErrFrame(msg) => throw new RuntimeException(msg)
            case WasmGuest.NilFrame => // skip nil items (sink behavior)
          }
        }
        result
      } finally nextFn = saved
    }
  }
}

object WasmGuest {

  sealed trait Frame
  final case class JsonFrame(bytes: Array[Byte]) extends Frame
  final case class ErrFrame(message: String) extends Frame
  case object NilFrame extends Frame
  case object EosFrame extends Frame

  /** Write one item (or EOS for None) into guest memory at a
   *  guest-allocated offset; returns the offset — the host side of the
   *  `next` import (reference: host-go/engine/pipes/fromSource.go:103-145
   *  and pipes/protocol.go:91-106 writeEOS). */
  private[ops] def writeFrame(
      inst: WasmInterp.Instance, item: Option[Array[Byte]]): Int =
    item match {
      case None =>
        val at = inst.invoke("alloc", 1L).head.toInt
        inst.writeBytes(at, Array(LensGuestModules.TypeEos.toByte))
        at
      case Some(bytes) =>
        val at = inst.invoke("alloc", (1L + 4L + bytes.length)).head.toInt
        val buf = java.nio.ByteBuffer.allocate(5 + bytes.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put(LensGuestModules.TypeJson.toByte).putInt(bytes.length).put(bytes)
        inst.writeBytes(at, buf.array())
        at
    }

  /** Read the frame at `offset` from guest memory (reference:
   *  host-go/engine/pipes/protocol.go:31-63 ReadItem). */
  private[ops] def readFrame(inst: WasmInterp.Instance, offset: Int): Frame = {
    val id = inst.readBytes(offset, 1)(0).toInt
    if (id == LensGuestModules.TypeEos) EosFrame
    else if (id == LensGuestModules.TypeNil) NilFrame
    else {
      val lenB = inst.readBytes(offset + 1, 4)
      val len = (lenB(0) & 0xFF) | (lenB(1) & 0xFF) << 8 |
        (lenB(2) & 0xFF) << 16 | (lenB(3) & 0xFF) << 24
      val data = inst.readBytes(offset + 5, len)
      if (id < 0) ErrFrame(new String(data, java.nio.charset.StandardCharsets.UTF_8))
      else JsonFrame(data)
    }
  }
}
