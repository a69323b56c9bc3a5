package graft.engine

import graft.model.{PipelineConfig, StageConfig}

import java.io.ByteArrayOutputStream
import scala.collection.immutable.SortedMap

/**
 * CARv1 (Content Addressable aRchive) serialization of a stored lens
 * config's block DAG — the concrete interop path to a reference node: the
 * blocks themselves are already byte-for-byte the reference's DAG-CBOR
 * layout ([[Cid]]), and CARv1 is the standard IPLD transport both sides of
 * an exchange can speak (header + varint-framed sections, per the public
 * spec at ipld.io/specs/transport/car/carv1):
 *
 *   - header: varint(len) ++ DAG-CBOR {"roots": [&config], "version": 1}
 *     (map keys in RFC 7049 canonical order — "roots" before "version" —
 *     links as CBOR tag 42 over identity-multibase-prefixed CID bytes,
 *     exactly like in-block links);
 *   - sections: varint(|cid| + |block|) ++ raw CID bytes ++ block bytes,
 *     leaves before parents (the reference's store order,
 *     reference: host-go/store/block.go:84-234), duplicates elided.
 *
 * Import is content-verified twice: every section's block must hash to its
 * claimed CID (a corrupt or substituted block is rejected, the guarantee
 * CIDv1 exists to give), and the RE-DERIVED CID of the reconstructed
 * config must equal the CAR's root (the reconstruction is faithful, not
 * merely parseable). Only graft's CID profile — CIDv1, dag-cbor,
 * sha2-256/32 — is accepted, the same boundary [[Cid.looksLikeCid]]
 * documents.
 *
 * Reconstruction maps lens payloads back to stage paths by the inverse of
 * [[Cid.payloadOf]]'s stand-in rule: a payload with the `\0asm` magic
 * becomes a self-contained `data:application/wasm;base64,…` stage (its
 * re-derived CID is IDENTICAL to the original's even when the original
 * used a `file:`/`http:` ref — content addressing sees bytes, not refs);
 * any other payload is the UTF-8 path string of an engine-internal stage
 * (`builtin:`, `sha256:` — the interop boundary: such configs round-trip
 * between graft engines but are not executable by a reference node).
 */
object Car {

  // ---- varint (unsigned LEB128, the multiformats uvarint) --------------
  private def writeUvarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos: Int = 0
    def hasMore: Boolean = pos < bytes.length
    def uvarint(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(pos < bytes.length && shift < 64, "truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= bytes.length, "truncated CAR section")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
  }

  // ---- minimal DAG-CBOR reader (the subset the block profile uses) -----
  private[engine] sealed trait Node
  private[engine] final case class CMap(entries: Vector[(String, Node)]) extends Node {
    def apply(k: String): Node = entries.collectFirst { case (`k`, v) => v }
      .getOrElse(throw new IllegalArgumentException(s"block missing key '$k'"))
    def has(k: String): Boolean = entries.exists(_._1 == k)
  }
  private[engine] final case class CArr(items: Vector[Node]) extends Node
  private[engine] final case class CText(s: String) extends Node
  private[engine] final case class CBytes(b: Array[Byte]) extends Node
  private[engine] final case class CBool(v: Boolean) extends Node
  private[engine] final case class CInt(v: Long) extends Node
  /** Raw CID bytes (identity multibase prefix already stripped). */
  private[engine] final case class CLink(cid: Array[Byte]) extends Node

  private def decodeCbor(r: Reader): Node = {
    val ib = r.take(1)(0) & 0xFF
    val major = ib >> 5
    val info = ib & 0x1F
    def arg(): Long = info match {
      case n if n < 24 => n.toLong
      case 24 => r.take(1)(0) & 0xFFL
      case 25 => val b = r.take(2); ((b(0) & 0xFFL) << 8) | (b(1) & 0xFFL)
      case 26 => val b = r.take(4)
        ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
          ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
      case other => throw new IllegalArgumentException(
        s"unsupported CBOR additional info $other")
    }
    major match {
      case 0 => CInt(arg())
      case 2 => CBytes(r.take(arg().toInt))
      case 3 => CText(new String(r.take(arg().toInt), "UTF-8"))
      case 4 => CArr(Vector.fill(arg().toInt)(decodeCbor(r)))
      case 5 => CMap(Vector.fill(arg().toInt) {
        decodeCbor(r) match {
          case CText(k) => k -> decodeCbor(r)
          case other => throw new IllegalArgumentException(
            s"non-text map key in DAG-CBOR: $other")
        }
      })
      case 6 =>
        require(arg() == 42, "only CBOR tag 42 (IPLD link) is supported")
        decodeCbor(r) match {
          case CBytes(b) =>
            require(b.nonEmpty && b(0) == 0x00,
              "IPLD link missing identity multibase prefix")
            CLink(b.drop(1))
          case other => throw new IllegalArgumentException(
            s"tag 42 over non-bytes: $other")
        }
      case 7 if info == 20 => CBool(false)
      case 7 if info == 21 => CBool(true)
      case other => throw new IllegalArgumentException(
        s"unsupported CBOR major type $other")
    }
  }

  private def requireProfile(cid: Array[Byte]): Unit =
    require(cid.length == 36 && cid(0) == 0x01 && cid(1) == 0x71.toByte &&
      cid(2) == 0x12 && cid(3) == 0x20,
      "CAR contains a CID outside graft's profile " +
        "(CIDv1, dag-cbor, sha2-256/32)")

  // ---- write ------------------------------------------------------------

  /** The CARv1 bytes of a config's block DAG (root = the config block).
   *  Blocks appear leaves-before-parents, duplicates elided. */
  def writeConfig(cfg: PipelineConfig,
      wasmBytesOf: String => Array[Byte] = Cid.payloadOf,
      maxBlockSize: Int = Cid.DefaultMaxBlockSize): Array[Byte] = {
    val (_, blocks) = Cid.configBlocks(cfg, wasmBytesOf, maxBlockSize)
    writeBlocks(Seq(blocks.last._2), blocks.map(_._2)) // config block last
  }

  /** A multi-root CAR of several configs' DAGs — the whole-registry
   *  export: one root per config (input order preserved), the block
   *  union deduped across configs (two lenses sharing a wasm module
   *  store its leaf once, exactly like a shared blockstore would). */
  def writeConfigs(cfgs: Seq[PipelineConfig],
      wasmBytesOf: String => Array[Byte] = Cid.payloadOf,
      maxBlockSize: Int = Cid.DefaultMaxBlockSize): Array[Byte] = {
    val perCfg = cfgs.map(c => Cid.configBlocks(c, wasmBytesOf, maxBlockSize)._2)
    writeBlocks(perCfg.map(_.last._2), perCfg.flatten.map(_._2))
  }

  /** Frame arbitrary blocks as a CARv1 with the given roots (each
   *  section's CID is computed from the block bytes; duplicates elided,
   *  order preserved). Public so interop specs can simulate a FOREIGN
   *  writer's section order — a reader must accept any. */
  def writeBlocks(rootBlocks: Seq[Array[Byte]],
      blocks: Seq[Array[Byte]]): Array[Byte] = {
    require(rootBlocks.nonEmpty, "a CAR needs at least one root")
    val out = new ByteArrayOutputStream()
    // header: {"roots": [&root, ...], "version": 1}
    val h = new ByteArrayOutputStream()
    h.write(0xA2)
    h.write(0x65); h.write("roots".getBytes("UTF-8"))
    val nRoots = rootBlocks.size
    if (nRoots < 24) h.write(0x80 | nRoots)
    else if (nRoots < 256) { h.write(0x98); h.write(nRoots) }
    else if (nRoots < 65536) { // 0x99 + 2-byte big-endian length
      h.write(0x99); h.write(nRoots >> 8); h.write(nRoots & 0xFF)
    } else { // 0x9A + 4-byte big-endian length
      h.write(0x9A); h.write(nRoots >>> 24); h.write((nRoots >> 16) & 0xFF)
      h.write((nRoots >> 8) & 0xFF); h.write(nRoots & 0xFF)
    }
    rootBlocks.foreach { rb =>
      val rootCid = Cid.cidOfBlock(rb)
      h.write(0xD8); h.write(42); h.write(0x58); h.write(rootCid.length + 1)
      h.write(0x00); h.write(rootCid, 0, rootCid.length)
    }
    h.write(0x67); h.write("version".getBytes("UTF-8"))
    h.write(0x01)
    val header = h.toByteArray
    writeUvarint(out, header.length.toLong)
    out.write(header, 0, header.length)
    val seen = scala.collection.mutable.HashSet.empty[String]
    blocks.foreach { block =>
      val cid = Cid.cidOfBlock(block)
      if (seen.add(Cid.cidString(cid))) {
        writeUvarint(out, (cid.length + block.length).toLong)
        out.write(cid, 0, cid.length)
        out.write(block, 0, block.length)
      }
    }
    out.toByteArray
  }

  // ---- read -------------------------------------------------------------

  /** Parse CARv1 bytes into (root CID strings, blocks by CID string).
   *  Every section is hash-verified against its claimed CID; order and
   *  duplicates are a writer's choice and irrelevant here. */
  def read(bytes: Array[Byte]): (Vector[String], Map[String, Array[Byte]]) = {
    val r = new Reader(bytes)
    val headerLen = r.uvarint().toInt
    val header = decodeCbor(new Reader(r.take(headerLen)))
    val (roots, version) = header match {
      case m: CMap => (m("roots"), m("version"))
      case other => throw new IllegalArgumentException(s"bad CAR header: $other")
    }
    require(version == CInt(1), s"unsupported CAR version: $version")
    val rootCids = roots match {
      case CArr(items) => items.map {
        case CLink(c) => requireProfile(c); Cid.cidString(c)
        case other => throw new IllegalArgumentException(s"non-link root: $other")
      }
      case other => throw new IllegalArgumentException(s"bad roots: $other")
    }
    require(rootCids.nonEmpty, "CAR has no roots")
    val blocks = Map.newBuilder[String, Array[Byte]]
    while (r.hasMore) {
      val sectionLen = r.uvarint().toInt
      require(sectionLen > 36, s"CAR section too short: $sectionLen")
      val cid = r.take(36)
      requireProfile(cid)
      val block = r.take(sectionLen - 36)
      require(java.util.Arrays.equals(Cid.cidOfBlock(block), cid),
        s"corrupt CAR block: bytes do not hash to ${Cid.cidString(cid)}")
      blocks += Cid.cidString(cid) -> block
    }
    (rootCids, blocks.result())
  }

  /** Reconstruct the PipelineConfig from a parsed block DAG (see the
   *  payload→path stand-in rule in the object doc). */
  private[engine] def configFromBlocks(rootCid: String,
      blocks: Map[String, Array[Byte]]): PipelineConfig = {
    def block(cid: Array[Byte]): Node = {
      val s = Cid.cidString(cid)
      decodeCbor(new Reader(blocks.getOrElse(s,
        throw new IllegalArgumentException(s"CAR missing linked block $s"))))
    }
    val config = decodeCbor(new Reader(blocks.getOrElse(rootCid,
      throw new IllegalArgumentException(s"CAR missing root block $rootCid"))))
    val modules = config match {
      case m: CMap => m("modules") match {
        case CArr(links) => links.map {
          case CLink(c) => block(c)
          case other => throw new IllegalArgumentException(s"non-link module: $other")
        }
        case other => throw new IllegalArgumentException(s"bad modules: $other")
      }
      case other => throw new IllegalArgumentException(s"bad config block: $other")
    }
    val stages = modules.map {
      case m: CMap =>
        val inverse = m("inverse") match {
          case CBool(v) => v
          case other => throw new IllegalArgumentException(s"bad inverse: $other")
        }
        val args = m("arguments") match {
          case CArr(kvs) => SortedMap.from(kvs.map {
            case kv: CMap => (kv("key"), kv("value")) match {
              case (CText(k), CText(v)) => k -> v
              case other => throw new IllegalArgumentException(s"bad argument: $other")
            }
            case other => throw new IllegalArgumentException(s"bad argument: $other")
          })
          case other => throw new IllegalArgumentException(s"bad arguments: $other")
        }
        val payload = m("lens") match {
          case CLink(c) => block(c) match {
            case lens: CMap if lens.has("wasmBytes") => lens("wasmBytes") match {
              case CBytes(b) => b
              case other => throw new IllegalArgumentException(s"bad wasmBytes: $other")
            }
            case lens: CMap if lens.has("chunks") => lens("chunks") match {
              case CArr(links) =>
                val bos = new ByteArrayOutputStream()
                links.foreach {
                  case CLink(lc) => block(lc) match {
                    case leaf: CMap => leaf("wasmBytes") match {
                      case CBytes(b) => bos.write(b, 0, b.length)
                      case other => throw new IllegalArgumentException(
                        s"bad chunk leaf: $other")
                    }
                    case other => throw new IllegalArgumentException(
                      s"bad chunk leaf: $other")
                  }
                  case other => throw new IllegalArgumentException(
                    s"non-link chunk: $other")
                }
                bos.toByteArray
              case other => throw new IllegalArgumentException(s"bad chunks: $other")
            }
            case other => throw new IllegalArgumentException(s"bad lens block: $other")
          }
          case other => throw new IllegalArgumentException(s"bad lens link: $other")
        }
        val path =
          if (payload.length >= 4 && payload(0) == 0x00 && payload(1) == 0x61 &&
            payload(2) == 0x73 && payload(3) == 0x6D)
            "data:application/wasm;base64," +
              java.util.Base64.getEncoder.encodeToString(payload)
          else new String(payload, "UTF-8")
        StageConfig(path, inverse, args)
      case other => throw new IllegalArgumentException(s"bad module block: $other")
    }
    PipelineConfig(stages)
  }

  /** Parse + reconstruct + verify: the reconstructed config's RE-DERIVED
   *  CID must equal the CAR's (single) root. Returns (root CID string,
   *  config). */
  def readConfig(bytes: Array[Byte],
      maxBlockSize: Int = Cid.DefaultMaxBlockSize): (String, PipelineConfig) = {
    val (roots, blocks) = read(bytes)
    require(roots.size == 1, s"expected a single-root lens CAR, got ${roots.size}")
    val cfg = configFromBlocks(roots.head, blocks)
    val (rederived, _) = Cid.configBlocks(cfg, Cid.payloadOf, maxBlockSize)
    require(rederived == roots.head,
      s"CAR reconstruction drifted: root ${roots.head}, re-derived $rederived")
    (roots.head, cfg)
  }

  /** Multi-root form of [[readConfig]]: every root reconstructs and
   *  verifies independently, in root order. */
  def readConfigs(bytes: Array[Byte],
      maxBlockSize: Int = Cid.DefaultMaxBlockSize): Seq[(String, PipelineConfig)] = {
    val (roots, blocks) = read(bytes)
    roots.map { root =>
      val cfg = configFromBlocks(root, blocks)
      val (rederived, _) = Cid.configBlocks(cfg, Cid.payloadOf, maxBlockSize)
      require(rederived == root,
        s"CAR reconstruction drifted: root $root, re-derived $rederived")
      (root, cfg)
    }
  }
}
