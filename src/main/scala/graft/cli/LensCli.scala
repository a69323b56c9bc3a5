package graft.cli

import graft.engine.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}
import scala.io.Source

/**
 * One-shot batch CLI — the reference's `host-go <lensFile.json> <
 * input.json > output.json` entry point (reference: host-go/cli/main.go:19-60):
 * read a JSON array of documents from stdin, run the lens pipeline
 * (optionally inverted), write the resulting JSON array to stdout.
 *
 * The reference drives a single-threaded pull loop; here the same contract
 * is one Catalyst plan over a parallel local session. Output rows are in
 * input order for order-preserving (narrow) pipelines: the input carries a
 * monotonic index used to sort before emission — the determinism the
 * reference gets from its one-item-at-a-time loop.
 *
 * Usage: LensCli <lensFile.json> [--inverse] < input.json > output.json
 */
object LensCli {

  /** Build the transformed, input-ordered DataFrame (None for empty input).
   *
   *  Error-as-data (reference P9, host-go/engine/module/protocol.go:43):
   *  `permissive = false` (default) fails fast on malformed documents, like
   *  the reference surfacing an ErrTypeID item as a Go error on `Value()`;
   *  `permissive = true` parses in PERMISSIVE mode instead — a malformed
   *  document becomes a row whose `__error` column carries the raw text
   *  (all data columns null), flowing through the pipeline as data exactly
   *  like the reference's negative-type-id error items. */
  private def transformed(spark: SparkSession, inputJson: String,
      lensJson: String, invert: Boolean, permissive: Boolean): Option[DataFrame] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pipeline = Pipeline.fromJson(lensJson)
    val bound = if (invert) pipeline.inverse else pipeline
    // One JSON doc per Dataset row; schema inferred like json.Unmarshal
    // into map[string]any (reference: host-go/cli/main.go:19-28).
    val docs = parseArray(inputJson)
    if (docs.isEmpty) return None
    val reader = spark.read
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .option("columnNameOfCorruptRecord", "__error")
    val in = reader.json(docs.toDS)
      .withColumn("__ord", monotonically_increasing_id())
    // Set-level stages (distinct/collect_group/sort/opaque) must not see
    // __ord — it is dropped at their boundary; after a sort the pipeline's
    // own order survives because the final orderBy below is skipped once
    // __ord is gone. Permissive mode additionally converts a FAILING stage
    // into in-band __error rows (P9 — see Pipeline.forwardPermissive).
    val out =
      if (permissive) bound.forwardPermissive(in, "__ord")
      else bound.forwardHiding(in, "__ord")
    Some(
      if (out.columns.contains("__ord")) out.orderBy(col("__ord")).drop("__ord")
      else out)
  }

  /** Core, testable transform: JSON array in → JSON array out. */
  def run(spark: SparkSession, inputJson: String, lensJson: String,
      invert: Boolean, permissive: Boolean): String =
    transformed(spark, inputJson, lensJson, invert, permissive)
      .map(_.toJSON.collect().mkString("[", ",", "]"))
      .getOrElse("[]")

  /** Core, testable transform: JSON array in → JSON array out. */
  def run(spark: SparkSession, inputJson: String, lensJson: String,
      invert: Boolean = false): String =
    run(spark, inputJson, lensJson, invert, permissive = false)

  /** Split a top-level JSON array into element strings (no full JSON lib
   *  needed — tracks nesting depth and string state only). */
  private[graft] def parseArray(s: String): Seq[String] = {
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"), "input must be a JSON array")
    val body = t.substring(1, t.length - 1)
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          val e = body.substring(start, i).trim; if (e.nonEmpty) out += e
          start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = body.substring(start).trim
    if (last.nonEmpty) out += last
    out.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: LensCli <lensFile.json> [--inverse] [--permissive] " +
        "[--in input.json] [--out dir]")
    val lensJson = Files.readString(Paths.get(args(0)))
    val invert = args.contains("--inverse")
    val permissive = args.contains("--permissive")
    def flagValue(flag: String): Option[String] = args.indexOf(flag) match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
      case _ => None
    }
    // --in <file> supports launchers that swallow stdin (e.g. sbt batch).
    val input = flagValue("--in").map(p => Files.readString(Paths.get(p)))
      .getOrElse(Source.stdin.mkString)
    // --out <dir>: distributed JSON-lines write instead of a driver-side
    // collect — the scale path for large outputs (stdout stays the
    // reference-parity default).
    val outDir = flagValue("--out")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-lens-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try outDir match {
      case Some(dir) =>
        transformed(spark, input, lensJson, invert, permissive) match {
          case Some(df) =>
            df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(dir)
            println(s"""{"written":"$dir"}""")
          case None =>
            // empty input: still materialize an (empty) output dir so the
            // success message never points at a missing/stale path
            Files.createDirectories(Paths.get(dir))
            println(s"""{"written":"$dir","rows":0}""")
        }
      case None =>
        println(run(spark, input, lensJson, invert, permissive))
    } finally spark.stop()
  }
}
