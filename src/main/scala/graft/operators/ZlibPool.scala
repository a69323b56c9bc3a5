package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater, ZipException}

/**
 * Thread-local reusable zlib codec instances for the per-row gzip/deflate
 * hot paths (WARC fixture encode + archive parse, PDF FlateDecode, PNG
 * IDAT). Every `new Deflater()` allocates ~256 KB of native zlib state
 * (window + hash chains) and every `new Inflater()` ~40 KB, freed by a
 * Cleaner — constructing one PER ROW (the r16 shape: `new
 * GZIPOutputStream` per WARC record, `new Inflater` per payload) turns a
 * per-row-CPU family into a native-malloc/Cleaner churn benchmark.
 * `reset()` restores a codec to its exactly-as-new state (zlib
 * deflateReset/inflateReset keep level/strategy/wrap), so the output
 * BYTES are identical to a fresh instance — which the zipnum/CDX offset
 * contracts require (they hash the encoded byte geometry). Pinned by
 * ZlibPoolSpec against the JDK stream classes byte-for-byte.
 *
 * Thread safety: Spark executor task threads are pooled; one codec per
 * (thread, wrap-mode) is bounded by the pool size (local[32] ⇒ ≤32 of
 * each, ~10 MB native total). Borrowers must NOT call `end()` and must
 * not hold the instance across rows of other borrow calls.
 */
object ZlibPool {

  private val zlibDeflaterTL = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater()
  }
  // nowrap + default level: the exact GZIPOutputStream configuration.
  private val rawDeflaterTL = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }
  private val zlibInflaterTL = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }
  private val rawInflaterTL = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater(true)
  }
  private val bufTL = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** zlib-wrapped Deflater (the `new Deflater()` config), reset. */
  def zlibDeflater(): Deflater = { val d = zlibDeflaterTL.get(); d.reset(); d }

  /** zlib-wrapped Inflater (the `new Inflater()` config), reset. */
  def zlibInflater(): Inflater = { val i = zlibInflaterTL.get(); i.reset(); i }

  /** Scratch copy buffer for deflate/inflate loops — thread-local, so a
   *  caller must finish with it before any other ZlibPool use. */
  def scratch(): Array[Byte] = bufTL.get()

  // The JDK's exact member header: no FLG/MTIME/XFL, OS = 0xff "unknown"
  // (GZIPOutputStream.writeHeader — NOT 0; ZlibPoolSpec caught the drift).
  private val GzHeader: Array[Byte] =
    Array(0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

  private def writeIntLE(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  /** Append ONE gzip member holding `b` — byte-identical to
   *  `new GZIPOutputStream(o).{write(b); finish()}`: the JDK's fixed
   *  all-zero header (no MTIME/XFL/OS), raw deflate at the default
   *  level, CRC32 + ISIZE little-endian trailer — but on the reusable
   *  thread-local Deflater instead of a fresh native allocation. */
  def gzipMember(o: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    o.write(GzHeader, 0, GzHeader.length)
    val d = rawDeflaterTL.get(); d.reset()
    d.setInput(b); d.finish()
    val buf = bufTL.get()
    while (!d.finished()) {
      val n = d.deflate(buf)
      if (n > 0) o.write(buf, 0, n)
    }
    val crc = new CRC32()
    crc.update(b, 0, b.length)
    writeIntLE(o, crc.getValue)
    writeIntLE(o, b.length.toLong & 0xffffffffL)
  }

  /**
   * Inflate a (possibly multi-member) gzip stream on the reusable
   * thread-local raw Inflater — the decode twin of [[gzipMember]],
   * replacing a `new GZIPInputStream` (fresh native Inflater) per
   * payload. Mirrors GZIPInputStream semantics exactly (ZlibPoolSpec
   * pins them): full RFC 1952 headers honored (FEXTRA/FNAME/FCOMMENT
   * skipped, FHCRC verified), per-member CRC32 + ISIZE verified
   * (ZipException on mismatch), and — like the JDK's readTrailer — a
   * header-parse failure on a SECOND-or-later member ends the stream
   * silently, while corrupt deflate data inside any member throws.
   */
  def gunzip(p: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, p.length * 3))
    val inf = rawInflaterTL.get()
    val buf = bufTL.get()
    val crc = new CRC32()
    var pos = parseHeader(p, 0)
    var done = false
    while (!done) {
      inf.reset()
      inf.setInput(p, pos, p.length - pos)
      crc.reset()
      var memberLen = 0L
      var finished = false
      while (!finished) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: DataFormatException =>
              val m = e.getMessage
              throw new ZipException(if (m != null) m else "Invalid ZLIB data format")
          }
        if (n > 0) {
          out.write(buf, 0, n)
          crc.update(buf, 0, n)
          memberLen += n
        } else if (inf.finished()) {
          finished = true
        } else {
          // needsInput with nothing left, or a dictionary request —
          // both are truncation/corruption for a gzip (raw) stream.
          throw new java.io.EOFException("Unexpected end of ZLIB input stream")
        }
      }
      pos = pos + (p.length - pos) - inf.getRemaining
      if (p.length - pos < 8)
        throw new java.io.EOFException("Unexpected end of ZLIB input stream")
      val trailerCrc = readIntLE(p, pos)
      val trailerLen = readIntLE(p, pos + 4)
      if (trailerCrc != crc.getValue || trailerLen != (memberLen & 0xffffffffL))
        throw new ZipException("Corrupt GZIP trailer")
      pos += 8
      if (pos >= p.length) done = true
      else {
        // JDK parity: a failed header parse after a complete member is
        // treated as end-of-stream (GZIPInputStream.readTrailer catches
        // the IOException), never an error.
        try pos = parseHeader(p, pos)
        catch { case _: java.io.IOException => done = true }
      }
    }
    out.toByteArray
  }

  private def readIntLE(p: Array[Byte], at: Int): Long =
    ((p(at) & 0xffL)) | ((p(at + 1) & 0xffL) << 8) |
      ((p(at + 2) & 0xffL) << 16) | ((p(at + 3) & 0xffL) << 24)

  /** Parse one RFC 1952 member header starting at `at`; returns the
   *  offset of the deflate data. Throws ZipException/EOFException the
   *  way GZIPInputStream.readHeader does. */
  private def parseHeader(p: Array[Byte], at: Int): Int = {
    def u8(i: Int): Int = {
      if (i >= p.length) throw new java.io.EOFException("Unexpected end of ZLIB input stream")
      p(i) & 0xff
    }
    if (u8(at) != 0x1f || u8(at + 1) != 0x8b)
      throw new ZipException("Not in GZIP format")
    if (u8(at + 2) != 8)
      throw new ZipException("Unsupported compression method")
    val flg = u8(at + 3)
    var pos = at + 10 // MTIME(4) + XFL + OS skipped
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = u8(pos) | (u8(pos + 1) << 8)
      pos += 2 + xlen
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      while (u8(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
      while (u8(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 2) != 0) { // FHCRC: CRC16 of the header bytes so far
      if (pos + 1 >= p.length)
        throw new java.io.EOFException("Unexpected end of ZLIB input stream")
      val c = new CRC32()
      c.update(p, at, pos - at)
      val expect = (c.getValue & 0xffff).toInt
      val got = u8(pos) | (u8(pos + 1) << 8)
      if (expect != got) throw new ZipException("Corrupt GZIP header")
      pos += 2
    }
    if (pos > p.length)
      throw new java.io.EOFException("Unexpected end of ZLIB input stream")
    pos
  }
}
