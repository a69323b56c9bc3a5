package graft.ops

import graft.model.Json

import scala.jdk.CollectionConverters._

/**
 * Typed accessors over a stage's `arguments` map (values are canonical JSON
 * strings, see graft.model.StageConfig). The error message for a missing
 * required key matches the reference's rename module
 * (reference: tests/modules/rust_wasm32_rename/src/lib.rs:31-37 —
 * "The requested property was not found").
 */
final case class Args(raw: Map[String, String]) {

  def has(key: String): Boolean = raw.contains(key)

  private def node(key: String) =
    Json.parse(raw.getOrElse(key,
      throw new IllegalArgumentException(
        s"The requested property was not found: '$key'")))

  def str(key: String): String = node(key).asText()
  def strOpt(key: String): Option[String] = if (has(key)) Some(str(key)) else None
  def int(key: String): Int = node(key).asInt()
  def intOpt(key: String): Option[Int] = if (has(key)) Some(int(key)) else None
  def double(key: String): Double = node(key).asDouble()
  def doubleOpt(key: String): Option[Double] = if (has(key)) Some(double(key)) else None
  def bool(key: String, default: Boolean = false): Boolean =
    if (has(key)) node(key).asBoolean(default) else default

  def strList(key: String): Seq[String] =
    node(key).elements().asScala.map(_.asText()).toSeq
  def strListOpt(key: String): Option[Seq[String]] =
    if (has(key)) Some(strList(key)) else None

  /** JSON object of string → number (e.g. mixture rates). */
  def doubleMap(key: String): Map[String, Double] = {
    val n = node(key)
    require(n.isObject, s"'$key' must be a JSON object")
    n.properties().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
  }
}

object Args {
  val empty: Args = Args(Map.empty)
}
