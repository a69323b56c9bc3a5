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

  test("JSON framing round-trips arrays of scalars (document lists)") {
    val schema = StructType(Seq(
      StructField("Name", StringType),
      StructField("PageNumbers", ArrayType(LongType))))
    val row = org.apache.spark.sql.Row("A", Seq(1L, 2L, 3L))
    assert(BytesGuest.fromJson(BytesGuest.toJson(row, schema), schema) == row)
    val empty = org.apache.spark.sql.Row("B", Seq.empty[Long])
    assert(BytesGuest.fromJson(BytesGuest.toJson(empty, schema), schema) == empty)
  }

  // ------------------------------------------------------------------
  // Reference CLI matrix through BYTE-level guests (tests/integration/
  // cli/with_inverse_test.go, with_params_test.go, with_len_change_test
  // .go): the same goldens the reference drives through compiled WASM,
  // here driven through the byte ABI — locking params (set_param),
  // inverse selection, and 1:N pull buffering so a real runtime swap-in
  // is provably drop-in.
  // ------------------------------------------------------------------

  import CliMatrixGuests._

  private val inversePeople =
    """[{"FullName": "John", "Age": 3}, {"FullName": "Fred", "Age": 5},
      | {"FullName": "Orpheus", "Age": 7}]""".stripMargin

  test("CLI golden: byte guest inverse export (reference TestInverse)") {
    GuestRegistry.register("bytes_agepm", BytesGuest.asRowGuest(AgeAddGuest(1L)))
    val lens =
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_agepm","serial":true},
        |  "inverse":true}]}""".stripMargin
    val out = graft.cli.LensCli.run(spark, inversePeople, lens)
    assert(out ==
      """[{"Age":2,"FullName":"John"},{"Age":4,"FullName":"Fred"},{"Age":6,"FullName":"Orpheus"}]""")
    // and the forward direction still adds
    val fwd = graft.cli.LensCli.run(spark, inversePeople,
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_agepm","serial":true}}]}""".stripMargin)
    assert(fwd ==
      """[{"Age":4,"FullName":"John"},{"Age":6,"FullName":"Fred"},{"Age":8,"FullName":"Orpheus"}]""")
  }

  test("CLI golden: inverse of a guest without the export errors (reference TestInverseErrors...)") {
    GuestRegistry.register("bytes_ageup_noinv", BytesGuest.asRowGuest(AgeUpGuest))
    val e = intercept[UnsupportedOperationException] {
      Pipeline.fromJson(
        """{"lenses":[{"path":"builtin:opaque",
          |  "arguments":{"guest":"bytes_ageup_noinv"},"inverse":true}]}""".stripMargin)
    }
    assert(e.getMessage.contains("does not export an inverse"))
  }

  test("CLI golden: set_param rename through the byte seam (reference TestWithParams)") {
    GuestRegistry.register("bytes_rename_param",
      BytesGuest.asRowGuest(RenameParamGuest))
    val people =
      """[{"Name": "John", "Age": 3}, {"Name": "Shahzad", "Age": 9},
        | {"Name": "Pavneet", "Age": 11}]""".stripMargin
    val lens =
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_rename_param","serial":true,
        |               "src":"Name","dst":"MiddleName"}}]}""".stripMargin
    val out = graft.cli.LensCli.run(spark, people, lens)
    assert(out ==
      """[{"Age":3,"MiddleName":"John"},{"Age":9,"MiddleName":"Shahzad"},{"Age":11,"MiddleName":"Pavneet"}]""")
  }

  test("CLI golden: param guest without parameters errors (reference ...NilParam)") {
    GuestRegistry.register("bytes_rename_param",
      BytesGuest.asRowGuest(RenameParamGuest))
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_rename_param"}}]}""".stripMargin)
    val e = intercept[Exception] {
      pipe.forward(Seq(("John", 3L)).toDF("Name", "Age")).collect()
    }
    assert(e.getMessage.contains("Parameters have not been set."))
  }

  test("CLI golden: bad param surfaces the guest's own error (reference ...BadParam)") {
    GuestRegistry.register("bytes_rename_param",
      BytesGuest.asRowGuest(RenameParamGuest))
    val pipe = Pipeline.fromJson(
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_rename_param",
        |               "src":"NotAField","dst":"MiddleName"}}]}""".stripMargin)
    val out = pipe.forwardPermissive(
      Seq((Option("John"), Option(3L))).toDF("Name", "Age"), "__ord")
    val errs = out.where("__error is not null")
      .select("__error").as[String].collect()
    assert(errs.length == 1 &&
      errs(0).contains("The requested property was not found. Requested: NotAField"))
  }

  test("CLI golden: pull-mode filter drops skip items (reference TestWithFilter)") {
    GuestRegistry.register("bytes_type_filter",
      BytesGuest.asPartitionGuest(TypeFilterGuest))
    val in =
      """[{"Name": "John", "__type": "pass"}, {"Name": "Fred", "__type": "skip"},
        | {"Name": "Orpheus", "__type": "pass"}]""".stripMargin
    val lens =
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_type_filter","serial":true}}]}""".stripMargin
    val out = graft.cli.LensCli.run(spark, in, lens)
    assert(out ==
      """[{"Name":"John","__type":"pass"},{"Name":"Orpheus","__type":"pass"}]""")
  }

  test("CLI golden: pull-mode 1:N normalize buffers pages (reference TestWithNormalize)") {
    GuestRegistry.register("bytes_normalize_books",
      BytesGuest.asPartitionGuest(NormalizeBooksGuest))
    val books =
      """[{"Name": "The Tiger who came to tea", "PageNumbers": [1, 2]},
        | {"Name": "The Elephant and the Balloon", "PageNumbers": [157, 235, 384]}]""".stripMargin
    val lens =
      """{"lenses":[{"path":"builtin:opaque",
        |  "arguments":{"guest":"bytes_normalize_books","serial":true}}]}""".stripMargin
    val out = graft.cli.LensCli.run(spark, books, lens)
    assert(out ==
      """[{"BookName":"The Tiger who came to tea","Number":1},""" +
      """{"BookName":"The Tiger who came to tea","Number":2},""" +
      """{"BookName":"The Elephant and the Balloon","Number":157},""" +
      """{"BookName":"The Elephant and the Balloon","Number":235},""" +
      """{"BookName":"The Elephant and the Balloon","Number":384}]""")
  }
}

/** The reference CLI matrix's module shapes as self-contained byte-level
 *  guests — top-level (no test-class capture) so the closures shipping to
 *  executors carry only the guest. */
private[graft] object CliMatrixGuests extends Serializable {
  import com.fasterxml.jackson.databind.ObjectMapper
  import graft.ops.{BytesGuest, PullBytesGuest}
  import org.apache.spark.sql.types._
  import java.nio.charset.StandardCharsets.UTF_8

  /** WasmPath2's shape: Age ± delta with an `inverse` export. */
  case class AgeAddGuest(delta: Long) extends BytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def inverseGuest: Option[BytesGuest] = Some(AgeAddGuest(-delta))
    override def open(): Array[Byte] => Array[Byte] = {
      val m = new ObjectMapper()
      bytes => {
        val node = m.readTree(new String(bytes, UTF_8))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("Age", node.get("Age").asLong() + delta)
        m.writeValueAsString(node).getBytes(UTF_8)
      }
    }
  }

  /** WasmPath4's shape: rename src→dst, parameterized via set_param; the
   *  unconfigured module errors, a missing property errors per item. */
  object RenameParamGuest extends BytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def open(): Array[Byte] => Array[Byte] =
      throw new IllegalStateException("Parameters have not been set.")
    override def configured(params: Option[Array[Byte]]): BytesGuest = {
      val p = params.getOrElse(throw new IllegalArgumentException(
        "Parameters have not been set."))
      val cfg = new ObjectMapper().readTree(new String(p, UTF_8))
      ConfiguredRename(cfg.get("src").asText(), cfg.get("dst").asText())
    }
  }

  case class ConfiguredRename(src: String, dst: String) extends BytesGuest {
    override def outputSchema(in: StructType): StructType =
      StructType(in.fields.map(f =>
        if (f.name == src) f.copy(name = dst) else f))
    override def open(): Array[Byte] => Array[Byte] = {
      val m = new ObjectMapper()
      val (s, d) = (src, dst)
      bytes => {
        val node = m.readTree(new String(bytes, UTF_8))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val v = node.remove(s)
        if (v == null) throw new IllegalArgumentException(
          s"The requested property was not found. Requested: $s")
        node.set(d, v)
        m.writeValueAsString(node).getBytes(UTF_8)
      }
    }
  }

  /** WasmPath6's shape: pull-mode filter — pulls until an item's __type
   *  is "pass" (1:≤1 len change through the byte ABI). */
  object TypeFilterGuest extends PullBytesGuest {
    override def outputSchema(in: StructType): StructType = in
    override def open(): (() => Option[Array[Byte]]) => Option[Array[Byte]] = {
      val m = new ObjectMapper()
      pull => {
        var out: Option[Array[Byte]] = None
        var continue = true
        while (continue) pull() match {
          case None => continue = false
          case Some(b) =>
            val t = m.readTree(new String(b, UTF_8)).get("__type")
            if (t != null && t.asText() == "pass") { out = Some(b); continue = false }
        }
        out
      }
    }
  }

  /** WasmPath7's shape: pull-mode normalize — pull one book, buffer its
   *  pages, emit them across subsequent Transform calls WITHOUT pulling
   *  (the 1:N buffering contract). */
  object NormalizeBooksGuest extends PullBytesGuest {
    override def outputSchema(in: StructType): StructType =
      StructType(Seq(StructField("BookName", StringType),
        StructField("Number", LongType)))
    override def open(): (() => Option[Array[Byte]]) => Option[Array[Byte]] = {
      val m = new ObjectMapper()
      val buffer = scala.collection.mutable.Queue.empty[Array[Byte]]
      pull => {
        if (buffer.nonEmpty) Some(buffer.dequeue())
        else {
          var out: Option[Array[Byte]] = None
          var continue = true
          while (continue) pull() match {
            case None => continue = false
            case Some(b) =>
              val n = m.readTree(new String(b, UTF_8))
              val name = n.get("Name").asText()
              n.get("PageNumbers").elements().forEachRemaining { pg =>
                val o = m.createObjectNode()
                o.put("BookName", name)
                o.put("Number", pg.asLong())
                buffer.enqueue(m.writeValueAsString(o).getBytes(UTF_8))
              }
              // a zero-page book yields nothing: keep pulling (1:0)
              if (buffer.nonEmpty) { out = Some(buffer.dequeue()); continue = false }
          }
          out
        }
      }
    }
  }
}
