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

  private def mapper = BytesGuestMapper.m

  /** One item → one JSON object (the reference host's framing). */
  private[graft] def toJson(row: Row, schema: StructType): Array[Byte] = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case StringType  => node.put(f.name, row.getString(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case LongType    => node.put(f.name, row.getLong(i))
        case DoubleType  => node.put(f.name, row.getDouble(i))
        case FloatType   => node.put(f.name, row.getFloat(i).toDouble)
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case ShortType   => node.put(f.name, row.getShort(i).toInt)
        case ByteType    => node.put(f.name, row.getByte(i).toInt)
        case other => throw new IllegalArgumentException(
          s"BytesGuest framing supports JSON scalars; column '${f.name}' is $other")
      }
    }
    mapper.writeValueAsString(node).getBytes(UTF_8)
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
        case StringType  => v.asText()
        case IntegerType => v.asInt()
        case LongType    => v.asLong()
        case DoubleType  => v.asDouble()
        case FloatType   => v.asDouble().toFloat
        case BooleanType => v.asBoolean()
        case ShortType   => v.asInt().toShort
        case ByteType    => v.asInt().toByte
        case other => throw new IllegalArgumentException(
          s"BytesGuest framing supports JSON scalars; column '${f.name}' is $other")
      }
    })
  }
}

/** Executor-side singleton mapper (ObjectMapper is not serializable and is
 *  expensive to build per item). */
private[ops] object BytesGuestMapper {
  @transient lazy val m = new ObjectMapper()
}
