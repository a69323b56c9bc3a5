package graft.ops

import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8

/**
 * P5 swap-in seam — the BYTE-level guest ABI beneath [[RowGuest]].
 *
 * The reference's WASM contract is bytes over linear memory: the host
 * allocates, writes one JSON-serialized item, calls `transform`, and reads
 * the JSON result back (reference: host-go/engine/module/instance.go:9-34;
 * fetch + instantiation host-go/engine/engine.go:59-104). This trait IS
 * that contract on the JVM: `open()` ≅ instantiate the module (once per
 * partition), the returned function ≅ one Alloc+write+Transform+read
 * round-trip per item.
 *
 * A real WASM runtime — a wasmtime JNI binding or a pure-JVM interpreter
 * (e.g. Chicory) — plugs in by implementing `open()` to instantiate the
 * compiled module and marshal bytes through its memory. NOTHING above this
 * seam changes: [[BytesGuest.asRowGuest]] mounts any implementation into
 * [[GuestRegistry]], so the same lens files (`builtin:opaque`), the same
 * stage fusion, and the same permissive error capture drive it. No such
 * runtime resolves offline in this container (and the reference ships no
 * `.wasm` artifacts), so the shipped implementations are JVM test doubles
 * — but they cross a genuine bytes-in/bytes-out boundary, exercised by
 * GuestSeamSpec.
 *
 * Row framing mirrors the reference host's item serialization: one JSON
 * object per item, field names = column names. Supported field types are
 * the JSON-representable scalars (string/boolean/integral/floating/null)
 * — the same value space the reference's JSON documents carry.
 */
trait BytesGuest extends Serializable {

  /** Schema after one application (the WASM analogue: the module's output
   *  document shape; stable across items). */
  def outputSchema(in: StructType): StructType

  /** Instantiate guest state (once per partition); the returned function
   *  performs one bytes-in/bytes-out transform per item. */
  def open(): Array[Byte] => Array[Byte]

  /** The `set_param` export at the byte level: the stage's arguments JSON
   *  (host keys removed), handed over once at configure time; returns the
   *  parameterized guest. The default models a module compiled WITHOUT
   *  the export (parameters error); a parameterized module overrides and
   *  conversely rejects None ("Parameters have not been set.", reference:
   *  tests/integration/cli/with_params_test.go). */
  def configured(paramsJson: Option[Array[Byte]]): BytesGuest = {
    require(paramsJson.isEmpty, "guest does not export set_param")
    this
  }

  /** The optional `inverse` export (reference:
   *  tests/integration/cli/with_inverse_test.go). */
  def inverseGuest: Option[BytesGuest] = None
}

/**
 * The PULL form of the byte ABI — for len-changing modules. The
 * reference's `Transform(next)` receives no item: the module pulls source
 * items itself through `next` (zero, one, or many per call — each one
 * JSON-framed, None = end of stream) and returns ONE framed output item
 * per call, or None once exhausted (reference:
 * host-go/engine/module/instance.go:16, host-go/engine/pipes/
 * fromPipe.go:36-140). A filter pulls until an item passes; a normalize
 * pulls one item, buffers, and emits the buffer across subsequent calls
 * WITHOUT pulling — the with_len_change CLI cases. Mounted via
 * [[BytesGuest.asPartitionGuest]].
 */
trait PullBytesGuest extends Serializable {

  /** Output document shape (stable across items). */
  def outputSchema(in: StructType): StructType

  /** Instantiate guest state (once per partition); the returned function
   *  is one `Transform(next)` call. */
  def open(): (() => Option[Array[Byte]]) => Option[Array[Byte]]

  /** `set_param`, as in [[BytesGuest.configured]]. */
  def configured(paramsJson: Option[Array[Byte]]): PullBytesGuest = {
    require(paramsJson.isEmpty, "guest does not export set_param")
    this
  }

  /** Optional `inverse` export, as in [[BytesGuest.inverseGuest]]. */
  def inverseGuest: Option[PullBytesGuest] = None

  /** `times` transform drivers for fused consecutive stages (P7). The
   *  default instantiates independently; a guest with shared mutable
   *  state (the wasm runtime) overrides to hand out `times` drivers over
   *  ONE instance, reproducing the reference's shared-instance counter
   *  semantics (ids 3, 6, 9 —
   *  host-go/engine/tests/wasm32_pipeline_with_state_test.go:16-100). */
  def openShared(times: Int)
      : Seq[(() => Option[Array[Byte]]) => Option[Array[Byte]]] =
    Seq.fill(times)(open())
}

object BytesGuest {

  /** Mount a byte-level guest behind the [[RowGuest]] seam: rows are
   *  JSON-framed exactly as the reference host serializes items, the guest
   *  sees only bytes, and its output bytes are parsed against the declared
   *  output schema (unknown/missing fields → null, like the reference's
   *  lenient document decode). Register the result in [[GuestRegistry]] to
   *  drive it from a `builtin:opaque` lens-file stage. */
  def asRowGuest(guest: BytesGuest): RowGuest = new RowGuest {
    override def outputSchema(in: StructType): StructType = guest.outputSchema(in)

    override def configured(params: Option[String]): RowGuest =
      asRowGuest(guest.configured(params.map(_.getBytes(UTF_8))))

    override def inverseGuest: Option[RowGuest] =
      guest.inverseGuest.map(asRowGuest)

    override def open(in: StructType): Row => Row = {
      val f = guest.open()
      // Under stage fusion (OpaqueOp applies the same instance k times per
      // item) applications 2..k receive the adapter's OWN previous output
      // row — recognized by object identity, since fresh items always come
      // from the source iterator — and are framed with the guest's output
      // shape instead of the stage input schema.
      var lastOut: Row = null
      var lastOutSchema: StructType = null
      row => {
        val rowSchema = if (row eq lastOut) lastOutSchema else in
        val outSchema = guest.outputSchema(rowSchema)
        val out = fromJson(f(toJson(row, rowSchema)), outSchema)
        lastOut = out
        lastOutSchema = outSchema
        out
      }
    }
  }

  /** Mount a pull-mode byte guest behind the [[PartitionGuest]] seam: the
   *  host feeds `next` with JSON-framed partition rows and drains
   *  `Transform(next)` until end-of-stream — the reference's pull loop
   *  (host-go/engine/pipes/fromPipe.go:36-140) with Spark's partition
   *  iterator as the source pipe. */
  def asPartitionGuest(guest: PullBytesGuest): PartitionGuest = new PartitionGuest {
    override def outputSchema(in: StructType): StructType = guest.outputSchema(in)

    override def configured(params: Option[String]): PartitionGuest =
      asPartitionGuest(guest.configured(params.map(_.getBytes(UTF_8))))

    override def inverseGuest: Option[PartitionGuest] =
      guest.inverseGuest.map(asPartitionGuest)

    override def open(in: StructType): Iterator[Row] => Iterator[Row] = {
      val out = guest.outputSchema(in)
      rows => stage(guest.open(), rows, in, out)
    }

    /** Fused consecutive stages drain through the drivers `openShared`
     *  hands out — ONE underlying guest instance when the implementation
     *  supports it (P7), independent instances otherwise. */
    override def openChain(in: StructType, times: Int)
        : Iterator[Row] => Iterator[Row] =
      rows0 => {
        val drivers = guest.openShared(times)
        var it = rows0
        var schema = in
        drivers.foreach { drv =>
          val out = guest.outputSchema(schema)
          it = stage(drv, it, schema, out)
          schema = out
        }
        it
      }

    private def stage(
        transform: (() => Option[Array[Byte]]) => Option[Array[Byte]],
        rows: Iterator[Row], in: StructType, out: StructType): Iterator[Row] = {
      val pull: () => Option[Array[Byte]] =
        () => if (rows.hasNext) Some(toJson(rows.next(), in)) else None
      new Iterator[Row] {
        private var pending: Row = null
        private var eos = false
        def hasNext: Boolean = pending != null || (!eos && {
          transform(pull) match {
            case Some(b) => pending = fromJson(b, out); true
            case None    => eos = true; false
          }
        })
        def next(): Row = { val r = pending; pending = null; r }
      }
    }
  }

  private def mapper = BytesGuestMapper.m

  private def putScalar(node: ObjectNode, name: String, dt: DataType,
      v: Any): Unit = dt match {
    case StringType  => node.put(name, v.asInstanceOf[String])
    case IntegerType => node.put(name, v.asInstanceOf[Int])
    case LongType    => node.put(name, v.asInstanceOf[Long])
    case DoubleType  => node.put(name, v.asInstanceOf[Double])
    case FloatType   => node.put(name, v.asInstanceOf[Float].toDouble)
    case BooleanType => node.put(name, v.asInstanceOf[Boolean])
    case ShortType   => node.put(name, v.asInstanceOf[Short].toInt)
    case ByteType    => node.put(name, v.asInstanceOf[Byte].toInt)
    case other => throw new IllegalArgumentException(
      s"BytesGuest framing supports JSON scalars; column '$name' is $other")
  }

  /** One item → one JSON object (the reference host's framing). Supported
   *  field types: the JSON-representable scalars plus one-level arrays of
   *  them — the value space the reference's JSON documents carry. */
  private[graft] def toJson(row: Row, schema: StructType): Array[Byte] = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case ArrayType(et, _) =>
          val arr = node.putArray(f.name)
          row.getSeq[Any](i).foreach {
            case null => arr.addNull()
            case v => et match {
              case StringType  => arr.add(v.asInstanceOf[String])
              case IntegerType => arr.add(v.asInstanceOf[Int])
              case LongType    => arr.add(v.asInstanceOf[Long])
              case DoubleType  => arr.add(v.asInstanceOf[Double])
              case FloatType   => arr.add(v.asInstanceOf[Float].toDouble)
              case BooleanType => arr.add(v.asInstanceOf[Boolean])
              case ShortType   => arr.add(v.asInstanceOf[Short].toInt)
              case ByteType    => arr.add(v.asInstanceOf[Byte].toInt)
              case other => throw new IllegalArgumentException(
                s"BytesGuest framing: unsupported array element $other in '${f.name}'")
            }
          }
        case dt => putScalar(node, f.name, dt, row.get(i))
      }
    }
    mapper.writeValueAsString(node).getBytes(UTF_8)
  }

  private def readScalar(v: JsonNode, dt: DataType, name: String): Any = dt match {
    case StringType  => v.asText()
    case IntegerType => v.asInt()
    case LongType    => v.asLong()
    case DoubleType  => v.asDouble()
    case FloatType   => v.asDouble().toFloat
    case BooleanType => v.asBoolean()
    case ShortType   => v.asInt().toShort
    case ByteType    => v.asInt().toByte
    case other => throw new IllegalArgumentException(
      s"BytesGuest framing supports JSON scalars; column '$name' is $other")
  }

  /** JSON object bytes → one Row in `schema` order; missing fields are
   *  null (lenient decode, as the reference host tolerates documents with
   *  absent keys). */
  private[graft] def fromJson(bytes: Array[Byte], schema: StructType): Row = {
    val node = mapper.readTree(new String(bytes, UTF_8))
    Row.fromSeq(schema.fields.toSeq.map { f =>
      val v: JsonNode = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case ArrayType(et, _) =>
          import scala.jdk.CollectionConverters._
          v.elements().asScala.map { e =>
            if (e.isNull) null else readScalar(e, et, f.name)
          }.toSeq
        case dt => readScalar(v, dt, f.name)
      }
    })
  }
}

/** Executor-side singleton mapper (ObjectMapper is not serializable and is
 *  expensive to build per item). */
private[ops] object BytesGuestMapper {
  @transient lazy val m = new ObjectMapper()
}
