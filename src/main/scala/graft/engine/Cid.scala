package graft.engine

import graft.model.{PipelineConfig, StageConfig}

import java.security.MessageDigest

/**
 * CIDv1/IPLD-compatible content ids for lens configs — the reference's
 * block layout reproduced byte-for-byte so a config authored here hashes
 * to the SAME CID a reference node would assign it (and vice versa):
 *
 *   - link prototype: CIDv1, dag-cbor (0x71), sha2-256/32
 *     (reference: host-go/store/store.go:275-282);
 *   - blocks: DAG-CBOR of the IPLD schema structs, map keys in schema
 *     declaration order (go-ipld-prime bindnode serializes struct fields
 *     in declaration order, not sorted) — configBlock {modules [Link]},
 *     moduleBlock {inverse, arguments [{key, value}], lens}, lensBlock
 *     keyed-union {"wasmBytes": Bytes} | {"chunks": [Link]}
 *     (reference: host-go/store/block.go:84-234);
 *   - module arguments sorted by key with JSON-serialized values
 *     (reference: host-go/store/block.go:323-338 — our StageConfig
 *     already holds exactly that shape);
 *   - wasm payloads above `maxBlockSize` (default 3 MiB —
 *     host-go/store/store.go:27) chunk into leaf lens blocks under a
 *     chunks root (reference: host-go/store/block.go:135-172);
 *   - links serialize as CBOR tag 42 over the identity-prefixed CID
 *     bytes; the string form is multibase base32-lower ('b' + RFC 4648
 *     unpadded), go-cid's default for v1.
 *
 * Interop boundary, documented: reference configs reference wasm modules
 * only — for a stage whose path is engine-internal (`builtin:`,
 * `sha256:`) there IS no wasm binary, so the path's UTF-8 bytes stand in
 * as the lens payload (stable and collision-free, but such configs are
 * not addressable by a reference node — nothing engine-internal can be).
 * Key sorting uses Java string order = byte order for ASCII keys (Go
 * sorts bytewise; non-BMP argument keys would diverge, same caveat as
 * Bpe.utf8Less documents for tokenizer tie-breaks).
 */
object Cid {

  val DefaultMaxBlockSize: Int = 3 * 1024 * 1024

  // ---- minimal DAG-CBOR writer (the subset the block layout needs) ----
  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    private def byte(b: Int): Unit = out.write(b)
    private def head(major: Int, n: Long): Unit = {
      val m = major << 5
      if (n < 24) byte(m | n.toInt)
      else if (n < 256) { byte(m | 24); byte(n.toInt) }
      else if (n < 65536) { byte(m | 25); byte((n >> 8).toInt); byte(n.toInt) }
      else {
        byte(m | 26); byte((n >> 24).toInt); byte((n >> 16).toInt)
        byte((n >> 8).toInt); byte(n.toInt)
      }
    }
    def text(s: String): Unit = {
      val b = s.getBytes("UTF-8"); head(3, b.length.toLong); out.write(b, 0, b.length)
    }
    def bin(b: Array[Byte]): Unit = {
      head(2, b.length.toLong); out.write(b, 0, b.length)
    }
    def mapHead(n: Int): Unit = head(5, n.toLong)
    def arrHead(n: Int): Unit = head(4, n.toLong)
    def bool(v: Boolean): Unit = byte(if (v) 0xF5 else 0xF4)
    /** CBOR tag 42 over the identity-multibase-prefixed CID bytes. */
    def link(cid: Array[Byte]): Unit = {
      byte(0xD8); byte(42); head(2, cid.length + 1L); byte(0x00)
      out.write(cid, 0, cid.length)
    }
    def result: Array[Byte] = out.toByteArray
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Raw CIDv1 bytes of a dag-cbor block: varint(1) ++ varint(0x71) ++
   *  multihash(0x12, 32, digest) — 36 bytes. */
  def cidOfBlock(block: Array[Byte]): Array[Byte] =
    Array[Byte](0x01, 0x71, 0x12, 0x20) ++ sha256(block)

  private val B32 = "abcdefghijklmnopqrstuvwxyz234567"

  /** Multibase base32-lower string form ('b' prefix, no padding). */
  def cidString(cid: Array[Byte]): String = {
    val sb = new StringBuilder("b")
    var acc = 0L; var nbits = 0
    cid.foreach { b =>
      acc = (acc << 8) | (b & 0xFFL); nbits += 8
      while (nbits >= 5) {
        nbits -= 5; sb += B32(((acc >> nbits) & 31L).toInt)
      }
    }
    if (nbits > 0) sb += B32(((acc << (5 - nbits)) & 31L).toInt)
    sb.result()
  }

  /** True only for a WELL-FORMED CIDv1(dag-cbor, sha2-256) string: 'b'
   *  multibase prefix, exactly 58 base32 chars decoding to 36 bytes with
   *  the 0x01 0x71 0x12 0x20 header. A reference node's CID parser
   *  rejects anything looser, and `resolve`'s contract is malformed id
   *  ⇒ error / unknown-but-well-formed ⇒ identity — a typo'd CID must
   *  surface, not silently pass data through. */
  def looksLikeCid(s: String): Boolean =
    s.length == 59 && s.charAt(0) == 'b' && {
      var acc = 0L; var nbits = 0; var i = 1
      val out = new Array[Byte](36); var n = 0; var ok = true
      while (ok && i < s.length) {
        val v = B32.indexOf(s.charAt(i))
        if (v < 0) ok = false
        else {
          acc = (acc << 5) | v.toLong; nbits += 5
          if (nbits >= 8) {
            nbits -= 8
            if (n < 36) { out(n) = ((acc >> nbits) & 0xFF).toByte; n += 1 }
            else ok = false
          }
        }
        i += 1
      }
      // trailing partial bits must be zero padding
      ok && n == 36 && (acc & ((1L << nbits) - 1L)) == 0L &&
        out(0) == 0x01.toByte && out(1) == 0x71.toByte &&
        out(2) == 0x12.toByte && out(3) == 0x20.toByte
    }

  // ---- foreign-CID acceptance (the resolve() interop boundary) --------

  private val Base58 =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  /** Big-integer decode of a base-58btc string (no leading-'1' CIDs
   *  exist in practice — a CID's first byte is never 0x00). */
  private def base58Decode(s: String): Option[Array[Byte]] = {
    var n = java.math.BigInteger.ZERO
    val fiftyEight = java.math.BigInteger.valueOf(58L)
    var i = 0
    while (i < s.length) {
      val v = Base58.indexOf(s.charAt(i))
      if (v < 0) return None
      n = n.multiply(fiftyEight).add(java.math.BigInteger.valueOf(v.toLong))
      i += 1
    }
    val raw = n.toByteArray
    Some(if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw)
  }

  /** RFC 4648 unpadded base32-lower decode of arbitrary length;
   *  trailing partial bits must be zero padding. */
  private def base32Decode(s: String): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var i = 0
    while (i < s.length) {
      val v = B32.indexOf(s.charAt(i))
      if (v < 0) return None
      acc = (acc << 5) | v.toLong; nbits += 5
      if (nbits >= 8) { nbits -= 8; out.write(((acc >> nbits) & 0xFF).toInt) }
      i += 1
    }
    if ((acc & ((1L << nbits) - 1L)) != 0L) None else Some(out.toByteArray)
  }

  /** Unsigned-varint reader over a byte array; returns (value, next). */
  private def uvarint(b: Array[Byte], at: Int): Option[(Long, Int)] = {
    var v = 0L; var shift = 0; var i = at
    while (i < b.length && shift < 64) {
      val x = b(i) & 0xFF
      v |= (x & 0x7FL) << shift
      if ((x & 0x80) == 0) return Some((v, i + 1))
      shift += 7; i += 1
    }
    None
  }

  /** Validate raw CIDv1 bytes: varint version 1, any codec varint, then
   *  a multihash (code varint, length varint, exactly-length digest). */
  private def validCidV1(b: Array[Byte]): Boolean = (for {
    (ver, p1) <- uvarint(b, 0) if ver == 1L
    (_, p2) <- uvarint(b, p1) // codec — any
    (_, p3) <- uvarint(b, p2) // multihash code — any
    (len, p4) <- uvarint(b, p3)
    // compare in Long: a crafted 64-bit length whose LOW 32 bits match
    // the digest size must not validate (.toInt would truncate it)
  } yield (b.length - p4).toLong == len).getOrElse(false)

  /** Parse ANY well-formed CID string to raw bytes: CIDv0 (bare 46-char
   *  base58btc `Qm…` multihash) or CIDv1 under multibase base16 ('f'),
   *  base32-lower ('b'), base36-lower ('k'), or base58btc ('z') — the
   *  encodings a reference node's go-cid parser accepts in the wild.
   *  None ⇔ not a CID at all. This is the gate [[LensEngine]] resolve()
   *  uses between "malformed id" (error) and "well-formed but foreign"
   *  (identity pass-through, like the reference's no-pool path —
   *  reference: host-go/repository/repository.go:244-254). */
  def parseAnyCid(s: String): Option[Array[Byte]] = {
    if (s.length == 46 && s.startsWith("Qm"))
      base58Decode(s).filter(b =>
        b.length == 34 && b(0) == 0x12.toByte && b(1) == 0x20.toByte)
    else if (s.length < 2) None
    else {
      val body = s.substring(1)
      val decoded: Option[Array[Byte]] = s.charAt(0) match {
        case 'b' => base32Decode(body)
        case 'f' =>
          if (body.matches("[0-9a-f]*") && body.length % 2 == 0)
            Some(body.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
          else None
        case 'k' =>
          if (body.matches("[0-9a-z]+"))
            scala.util.Try {
              val raw = new java.math.BigInteger(body, 36).toByteArray
              if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw
            }.toOption
          else None
        case 'z' => base58Decode(body)
        case _   => None
      }
      decoded.filter(validCidV1)
    }
  }

  /** Is this raw CID exactly graft's minted profile (CIDv1, dag-cbor,
   *  sha2-256/32)? Such ids are resolvable regardless of which multibase
   *  the caller spelled them in. */
  def isGraftProfile(b: Array[Byte]): Boolean =
    b.length == 36 && b(0) == 0x01.toByte && b(1) == 0x71.toByte &&
      b(2) == 0x12.toByte && b(3) == 0x20.toByte

  /** Lens block(s) for a wasm payload: one `wasmBytes` leaf if it fits
   *  `maxBlockSize`, else leaf blocks under a `chunks` root (zero chunks
   *  for an empty payload — mirroring Go's slices.Chunk). Returns the
   *  root link's raw CID bytes plus every (cidString, blockBytes). */
  def lensBlocks(payload: Array[Byte],
      maxBlockSize: Int = DefaultMaxBlockSize): (Array[Byte], Vector[(String, Array[Byte])]) = {
    def leaf(chunk: Array[Byte]): Array[Byte] = {
      val w = new W; w.mapHead(1); w.text("wasmBytes"); w.bin(chunk); w.result
    }
    val chunks =
      if (payload.isEmpty) Vector.empty
      else payload.grouped(maxBlockSize).toVector
    if (chunks.length == 1) {
      val b = leaf(chunks.head); val c = cidOfBlock(b)
      (c, Vector((cidString(c), b)))
    } else {
      val leaves = chunks.map { ch => val b = leaf(ch); (cidOfBlock(b), b) }
      val w = new W; w.mapHead(1); w.text("chunks"); w.arrHead(leaves.length)
      leaves.foreach { case (c, _) => w.link(c) }
      val root = w.result; val c = cidOfBlock(root)
      (c, leaves.map { case (cc, b) => (cidString(cc), b) } :+ (cidString(c), root))
    }
  }

  /** Module block: {inverse, arguments (sorted KeyValue), lens link}. */
  def moduleBlock(stage: StageConfig, lensLink: Array[Byte]): Array[Byte] = {
    val w = new W
    w.mapHead(3)
    w.text("inverse"); w.bool(stage.inverse)
    w.text("arguments"); w.arrHead(stage.arguments.size)
    stage.arguments.foreach { case (k, v) => // SortedMap — already key-sorted
      w.mapHead(2); w.text("key"); w.text(k); w.text("value"); w.text(v)
    }
    w.text("lens"); w.link(lensLink)
    w.result
  }

  /**
   * The full config DAG: per stage a lens block (chunked as needed) and a
   * module block, then the config block linking the modules in order.
   * Returns (config CID string, every (cidString, blockBytes) in
   * store order — leaves before parents, the reference's write order).
   */
  def configBlocks(cfg: PipelineConfig, wasmBytesOf: String => Array[Byte],
      maxBlockSize: Int = DefaultMaxBlockSize): (String, Vector[(String, Array[Byte])]) = {
    val all = Vector.newBuilder[(String, Array[Byte])]
    val moduleLinks = cfg.lenses.map { stage =>
      val (lensLink, blocks) = lensBlocks(wasmBytesOf(stage.path), maxBlockSize)
      all ++= blocks
      val mb = moduleBlock(stage, lensLink)
      val mc = cidOfBlock(mb)
      all += ((cidString(mc), mb))
      mc
    }
    val w = new W
    w.mapHead(1); w.text("modules"); w.arrHead(moduleLinks.length)
    moduleLinks.foreach(w.link)
    val cb = w.result
    val cc = cidOfBlock(cb)
    all += ((cidString(cc), cb))
    (cidString(cc), all.result())
  }

  /** The stand-in payload rule for a stage path (see the interop-boundary
   *  note above): fetchable refs yield the real module bytes, engine-
   *  internal paths their UTF-8 bytes. */
  def payloadOf(path: String): Array[Byte] =
    if (ModuleFetch.supports(path)) ModuleFetch.fetchBytes(path)
    else path.getBytes("UTF-8")
}
