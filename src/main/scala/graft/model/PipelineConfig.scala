package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import java.security.MessageDigest
import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

/**
 * One pipeline stage, mirroring the reference lens-file model
 * (reference: host-go/config/model/lens.go:11-30 — `Lens{Path, Inverse,
 * Arguments}`). `path` names a registered transform (our analogue of a WASM
 * module URL); `inverse=true` runs the stage's inverse direction
 * (reference: host-go/config/config.go:84-100).
 *
 * Argument values are kept as *canonical JSON strings*, exactly like the
 * reference stores them for deterministic content ids
 * (reference: host-go/store/block.go:323-338 — sorted KeyValue pairs of
 * key + JSON-encoded value).
 */
final case class StageConfig(
    path: String,
    inverse: Boolean = false,
    arguments: SortedMap[String, String] = SortedMap.empty) {

  def canonicalJson: String = {
    val args = arguments.map { case (k, v) => s"${Json.quote(k)}:$v" }.mkString("{", ",", "}")
    s"""{"arguments":$args,"inverse":$inverse,"path":${Json.quote(path)}}"""
  }
}

/**
 * A full pipeline config — the reference's "lens file"
 * (reference: host-go/config/internal/json/json.go:14-48 —
 * `{"lenses":[{path,inverse,arguments}]}`).
 */
final case class PipelineConfig(lenses: Seq[StageConfig]) {

  /** Deterministic serialized form — sorted keys, no whitespace. */
  def canonicalJson: String =
    lenses.map(_.canonicalJson).mkString("""{"lenses":[""", ",", "]}")

  /**
   * Content id of the pipeline: sha-256 over the canonical JSON, analogous
   * to the reference's CIDv1(sha2-256) over the DAG-CBOR config block
   * (reference: host-go/store/store.go:275-282). Identical pipelines get
   * identical ids, so a registry dedupes for free
   * (reference: host-go/store/store.go:30-33).
   */
  def contentId: String = {
    val d = MessageDigest.getInstance("SHA-256")
    "sha256:" + d.digest(canonicalJson.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

object PipelineConfig {
  private val mapper = new ObjectMapper()

  /** Parse a lens file. Unknown top-level/stage keys are ignored, like the
   *  reference's permissive json.Unmarshal. */
  def fromJson(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    val lensesNode = root.get("lenses")
    require(lensesNode != null && lensesNode.isArray,
      "lens file must contain a top-level \"lenses\" array")
    val stages = lensesNode.elements().asScala.map { n =>
      val path = Option(n.get("path")).map(_.asText())
        .getOrElse(throw new IllegalArgumentException("lens stage missing \"path\""))
      val inverse = Option(n.get("inverse")).exists(_.asBoolean(false))
      val args: SortedMap[String, String] = Option(n.get("arguments")) match {
        case Some(a) if a.isObject =>
          SortedMap.from(a.properties().asScala.map(e =>
            e.getKey -> Json.canonical(e.getValue)))
        case _ => SortedMap.empty[String, String]
      }
      StageConfig(path, inverse, args)
    }.toSeq
    PipelineConfig(stages)
  }
}

/** Minimal canonical-JSON helpers (Jackson ships with Spark). */
object Json {
  private val mapper = new ObjectMapper()
  private val factory = JsonNodeFactory.instance

  def quote(s: String): String = mapper.writeValueAsString(factory.textNode(s))

  /** Render a JsonNode with object keys sorted, no whitespace. */
  def canonical(n: JsonNode): String = {
    if (n.isObject) {
      n.properties().asScala.toSeq.sortBy(_.getKey)
        .map(e => s"${quote(e.getKey)}:${canonical(e.getValue)}")
        .mkString("{", ",", "}")
    } else if (n.isArray) {
      n.elements().asScala.map(canonical).mkString("[", ",", "]")
    } else mapper.writeValueAsString(n)
  }

  def parse(s: String): JsonNode = mapper.readTree(s)
}
