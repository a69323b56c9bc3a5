package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.engine.Pipeline
import graft.ops.{BytesGuest, GuestRegistry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/**
 * The P5 WASM swap-in seam (VERDICT r4 #8): a guest that sees ONLY bytes
 * — JSON-framed items, exactly the reference host's serialization
 * (reference: host-go/engine/module/instance.go:9-34) — driven through
 * the same GuestRegistry + `builtin:opaque` path a real
 * wasmtime/Chicory-backed module would use. Everything above
 * `BytesGuest.open()` is production code; only the bytes→bytes function
 * is a test double standing where the WASM call would sit.
 */
class GuestSeamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** A "module" that parses the JSON item itself, increments Age and
   *  uppercases Name — byte-level, schema-preserving. */
  private object AgeUpGuest extends BytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def open(): Array[Byte] => Array[Byte] = {
      val m = new ObjectMapper()
      bytes => {
        val node = m.readTree(new String(bytes, UTF_8))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("Age", node.get("Age").asLong() + 1L)
        node.put("Name", node.get("Name").asText().toUpperCase)
        m.writeValueAsString(node).getBytes(UTF_8)
      }
    }
  }

  /** A stateful byte-level counter (the reference's wasm32_counter shape):
   *  instance state lives across items, set via the Id field. */
  private object ByteCounterGuest extends BytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def open(): Array[Byte] => Array[Byte] = {
      val m = new ObjectMapper()
      var n = 0L
      bytes => {
        val node = m.readTree(new String(bytes, UTF_8))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        n += 1
        node.put("Id", n)
        m.writeValueAsString(node).getBytes(UTF_8)
      }
    }
  }

  /** A guest that rejects one poison item (P9 error-as-data through the
   *  byte seam). */
  private object FussyBytesGuest extends BytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def open(): Array[Byte] => Array[Byte] = {
      val m = new ObjectMapper()
      bytes => {
        val s = new String(bytes, UTF_8)
        if (s.contains("poison")) throw new IllegalStateException("bad item")
        m.writeValueAsString(m.readTree(s)).getBytes(UTF_8)
      }
    }
  }

  test("bytes-in/bytes-out guest runs from a lens file through the opaque seam") {
    GuestRegistry.register("bytes_ageup", BytesGuest.asRowGuest(AgeUpGuest))
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:opaque","arguments":{"guest":"bytes_ageup"}}]}""")
    val out = pipe.forward(Seq(("John", 32L), ("Ada", 36L)).toDF("Name", "Age"))
      .as[(String, Long)].collect().toSet
    assert(out == Set(("JOHN", 33L), ("ADA", 37L)))
  }

  test("byte-level counter fuses across appended stages with shared state (3,6,9)") {
    GuestRegistry.register("bytes_counter", BytesGuest.asRowGuest(ByteCounterGuest))
    val stage =
      """{"path":"builtin:opaque","arguments":
        |  {"guest":"bytes_counter","instance":"bc","serial":true}}""".stripMargin
    val pipe = Pipeline.fromJson(s"""{"lenses":[$stage,$stage,$stage]}""")
    assert(pipe.stages.length == 1, "same-instance byte guests must fuse")
    val in = Seq((0L, "John"), (0L, "Shahzad"), (0L, "Addo")).toDF("Id", "Name")
    val out = pipe.forward(in).as[(Long, String)].collect().toSeq
    assert(out == Seq((3L, "John"), (6L, "Shahzad"), (9L, "Addo")),
      "item i must flow through all fused applications before item i+1")
  }

  test("byte guest errors surface as __error rows in permissive mode") {
    GuestRegistry.register("bytes_fussy", BytesGuest.asRowGuest(FussyBytesGuest))
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:opaque","arguments":{"guest":"bytes_fussy"}}]}""")
    // nullable columns, as real document sources have — error rows null
    // the data columns, so the schema must admit null.
    val in = Seq(("ok", Option(1L)), ("poison", Option(2L)), ("fine", Option(3L)))
      .toDF("Name", "Age")
    val out = pipe.forwardPermissive(in, "__ord")
    val errs = out.where("__error is not null").collect()
    val good = out.where("__error is null").select("Name")
      .as[String].collect().toSet
    assert(errs.length == 1)
    assert(errs(0).getString(errs(0).fieldIndex("__error")).contains("bad item"))
    assert(good == Set("ok", "fine"))
  }

  test("JSON framing round-trips scalars and nulls; missing fields decode null") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType)))
    val row = org.apache.spark.sql.Row("x", 1, 2L, 3.5, true)
    val bytes = BytesGuest.toJson(row, schema)
    assert(BytesGuest.fromJson(bytes, schema) == row)
    val withNull = org.apache.spark.sql.Row(null, 1, 2L, 3.5, true)
    assert(BytesGuest.fromJson(BytesGuest.toJson(withNull, schema), schema) == withNull)
    // lenient decode: a field the guest dropped comes back null
    val dropped = """{"s":"x"}""".getBytes(UTF_8)
    val decoded = BytesGuest.fromJson(dropped, schema)
    assert(decoded.getString(0) == "x" && decoded.isNullAt(1) && decoded.isNullAt(4))
  }
}
