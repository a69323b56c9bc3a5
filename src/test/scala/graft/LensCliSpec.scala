package graft

import graft.cli.LensCli
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden end-to-end CLI tests replicating the reference's integration
 * cases (reference: tests/integration/cli — simple_test.go,
 * with_inverse_test.go, with_modules_params_test.go,
 * with_len_change_test.go, with_state_test.go): JSON array in → lens
 * pipeline → JSON array out, byte-for-byte goldens.
 */
class LensCliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val people = """[{"Age": 21, "Name": "John"}, {"Age": 9, "Name": "Fred"}]"""

  test("no modules: identity pass-through (reference simple_test no-lens case)") {
    val out = LensCli.run(spark, people, """{"lenses":[]}""")
    assert(out == """[{"Age":21,"Name":"John"},{"Age":9,"Name":"Fred"}]""")
  }

  test("simple: rename Name -> FullName (reference T1)") {
    val lens =
      """{"lenses":[{"path":"builtin:rename","arguments":{"src":"Name","dst":"FullName"}}]}"""
    val out = LensCli.run(spark, people, lens)
    assert(out == """[{"Age":21,"FullName":"John"},{"Age":9,"FullName":"Fred"}]""")
  }

  test("with_column + inverse round-trip (reference T2: age+1 / age-1)") {
    val lens =
      """{"lenses":[{"path":"builtin:with_column",
        |  "arguments":{"col":"Age","expr":"Age + 1","inverse_expr":"Age - 1"}}]}""".stripMargin
    val fwd = LensCli.run(spark, people, lens)
    assert(fwd == """[{"Age":22,"Name":"John"},{"Age":10,"Name":"Fred"}]""")
    val back = LensCli.run(spark, fwd, lens, invert = true)
    assert(back == """[{"Age":21,"Name":"John"},{"Age":9,"Name":"Fred"}]""")
  }

  test("filter + explode: consume-many/yield-many (reference T5/T6 len change)") {
    val books =
      """[{"Name": "A", "PageNumbers": [1, 2]},
        | {"Name": "B", "PageNumbers": []},
        | {"Name": "C", "PageNumbers": [7]}]""".stripMargin
    val lens =
      """{"lenses":[
        |  {"path":"builtin:filter","arguments":{"expr":"Name != 'B'"}},
        |  {"path":"builtin:explode","arguments":{"col":"PageNumbers","as":"Number"}},
        |  {"path":"builtin:rename","arguments":{"src":"Name","dst":"BookName"}}
        |]}""".stripMargin
    val out = LensCli.run(spark, books, lens)
    assert(out ==
      """[{"BookName":"A","Number":1},{"BookName":"A","Number":2},{"BookName":"C","Number":7}]""")
  }

  test("a lens file shipping a real .wasm module runs through the one-shot CLI") {
    val url = "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(
        graft.wasm.LensGuestModules.shiftGuest("Age"))
    val lens = s"""{"lenses":[{"path":"$url","arguments":{"delta":5}}]}"""
    val fwd = LensCli.run(spark, people, lens)
    assert(fwd == """[{"Age":26,"Name":"John"},{"Age":14,"Name":"Fred"}]""")
    // inverse selects the module's own `inverse` export
    val back = LensCli.run(spark, fwd, lens, invert = true)
    assert(back == """[{"Age":21,"Name":"John"},{"Age":9,"Name":"Fred"}]""")
  }

  test("a schema-changing wasm normalize module: the reference books golden") {
    val url = "data:application/wasm;base64," +
      java.util.Base64.getEncoder.encodeToString(
        graft.wasm.LensGuestModules.normalizeGuest())
    val books =
      """[{"Name": "A", "PageNumbers": [1, 2]},
        | {"Name": "B", "PageNumbers": []},
        | {"Name": "C", "PageNumbers": [7]}]""".stripMargin
    val out = LensCli.run(spark, books,
      s"""{"lenses":[{"path":"$url",
         |  "arguments":{"schema":"BookName STRING, Number BIGINT"}}]}""".stripMargin)
    assert(out ==
      """[{"BookName":"A","Number":1},{"BookName":"A","Number":2},{"BookName":"C","Number":7}]""")
  }

  test("stateful counter assigns sequential ids (reference T7)") {
    val lens =
      """{"lenses":[{"path":"builtin:counter",
        |  "arguments":{"as":"Id","order_by":"Name"}}]}""".stripMargin
    val out = LensCli.run(spark, people, lens)
    // ids follow order_by (Name: Fred=1, John=2); row order stays input order
    assert(out == """[{"Age":21,"Name":"John","Id":2},{"Age":9,"Name":"Fred","Id":1}]""")
  }

  test("memory module: identity (reference T8)") {
    val lens = """{"lenses":[{"path":"builtin:memory","arguments":{}}]}"""
    assert(LensCli.run(spark, people, lens) ==
      """[{"Age":21,"Name":"John"},{"Age":9,"Name":"Fred"}]""")
  }

  test("empty input array") {
    assert(LensCli.run(spark, "[]", """{"lenses":[]}""") == "[]")
  }

  test("distinct: set-level op ignores the CLI's hidden ordinal") {
    val dup = """[{"Age": 1, "Name": "A"}, {"Age": 1, "Name": "A"}, {"Age": 2, "Name": "B"}]"""
    val lens = """{"lenses":[{"path":"builtin:distinct","arguments":{}}]}"""
    val out = LensCli.parseArray(LensCli.run(spark, dup, lens))
    assert(out.length == 2)
    assert(out.toSet == Set("""{"Age":1,"Name":"A"}""", """{"Age":2,"Name":"B"}"""))
  }

  test("collect_group: groups are not split by the CLI's hidden ordinal") {
    val pages =
      """[{"BookName": "A", "Number": 1},
        | {"BookName": "A", "Number": 2},
        | {"BookName": "C", "Number": 7}]""".stripMargin
    val lens =
      """{"lenses":[{"path":"builtin:collect_group",
        |  "arguments":{"col":"Number","as":"PageNumbers"}}]}""".stripMargin
    val out = LensCli.parseArray(LensCli.run(spark, pages, lens))
    assert(out.length == 2) // the bug made every group a singleton (3 rows)
    val a = out.find(_.contains(""""BookName":"A"""")).get
    assert(a.contains("1") && a.contains("2")) // collect_list order unspecified
    assert(out.exists(_ == """{"BookName":"C","PageNumbers":[7]}"""))
  }

  test("sort: pipeline-defined order survives (not undone by input re-order)") {
    val lens = """{"lenses":[{"path":"builtin:sort","arguments":{"cols":["Age"]}}]}"""
    val out = LensCli.run(spark, people, lens)
    assert(out == """[{"Age":9,"Name":"Fred"},{"Age":21,"Name":"John"}]""")
  }

  test("opaque guest via lens file (P5): shared instance x3 counts 3,6,9") {
    graft.ops.GuestRegistry.register("cli_counter", new graft.ops.RowGuest {
      override def outputSchema(in: org.apache.spark.sql.types.StructType) = in
      override def open(in: org.apache.spark.sql.types.StructType)
          : org.apache.spark.sql.Row => org.apache.spark.sql.Row = {
        val idx = in.fieldIndex("Id")
        var n = 0L
        r => { n += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(idx, n)) }
      }
    })
    val input =
      """[{"Id": 0, "Name": "John"}, {"Id": 0, "Name": "Shahzad"}, {"Id": 0, "Name": "Addo"}]"""
    val stage =
      """{"path":"builtin:opaque","arguments":{"guest":"cli_counter","instance":"i1","serial":true}}"""
    val out = LensCli.run(spark, input, s"""{"lenses":[$stage,$stage,$stage]}""")
    assert(out ==
      """[{"Id":3,"Name":"John"},{"Id":6,"Name":"Shahzad"},{"Id":9,"Name":"Addo"}]""")
  }

  test("per-op error-as-data (P9): failing stage emits __error rows in permissive mode") {
    val lens =
      """{"lenses":[
        |  {"path":"builtin:with_column","arguments":{"col":"Age","expr":"Age + 1"}},
        |  {"path":"builtin:rename","arguments":{"src":"Nope","dst":"X"}}
        |]}""".stripMargin
    // fail-fast: surfaced as an error, like the reference's Value() error
    intercept[Exception] { LensCli.run(spark, people, lens) }
    // permissive: every row entering the failing stage flows on as an
    // in-band __error item
    val out = LensCli.parseArray(
      LensCli.run(spark, people, lens, invert = false, permissive = true))
    assert(out.length == 2)
    assert(out.forall(r => r.contains("__error") &&
      r.contains("rename(Nope->X)") &&
      r.contains("The requested property was not found")))
  }

  test("per-ROW error-as-data (P9): a guest throwing on one item yields one __error row") {
    graft.ops.GuestRegistry.register("cli_fussy", new graft.ops.RowGuest {
      override def outputSchema(in: org.apache.spark.sql.types.StructType) = in
      override def open(in: org.apache.spark.sql.types.StructType)
          : org.apache.spark.sql.Row => org.apache.spark.sql.Row = {
        val idx = in.fieldIndex("Age")
        r => {
          if (r.getLong(idx) < 10) throw new IllegalStateException("too young")
          r
        }
      }
    })
    val lens = """{"lenses":[{"path":"builtin:opaque","arguments":{"guest":"cli_fussy"}}]}"""
    // fail-fast: the guest exception surfaces as a job failure
    intercept[Exception] { LensCli.run(spark, people, lens) }
    // permissive: the good row passes through; the bad ITEM becomes an
    // __error row while the rest of the partition is unaffected
    val out = LensCli.parseArray(
      LensCli.run(spark, people, lens, invert = false, permissive = true))
    assert(out.length == 2)
    assert(out.exists(r => r.contains(""""Name":"John"""") && !r.contains("__error")))
    assert(out.exists(r => r.contains("__error") && r.contains("too young")))
  }

  test("error-as-data (P9): permissive mode carries malformed docs, fail-fast throws") {
    val mixed = """[{"Age": 1, "Name": "ok"}, {"Age": BROKEN}]"""
    // fail-fast (default): surfaced as an error, like ErrTypeID -> Go error
    intercept[Exception] {
      LensCli.run(spark, mixed, """{"lenses":[]}""")
    }
    // permissive: the bad document becomes an __error row flowing as data
    val out = LensCli.run(spark, mixed, """{"lenses":[]}""",
      invert = false, permissive = true)
    assert(out.contains(""""Name":"ok""""))
    assert(out.contains("__error") && out.contains("BROKEN"))
  }
}
