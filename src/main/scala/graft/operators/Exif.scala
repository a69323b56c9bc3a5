package graft.operators

/**
 * EXIF metadata walk over JPEG APP1 segments — the image-corpus triage
 * complement of [[Mp3.id3TextFrames]]: orientation (the tag every
 * perceptual-hash/dedup pipeline must honor before pixels are
 * compared), camera make/model, original timestamp and the declared
 * pixel dimensions, all WITHOUT entropy-decoding a single MCU. EXIF is
 * a TIFF structure (byte order II/MM, IFD0 entries, an Exif sub-IFD)
 * embedded in the `Exif\0\0` APP1 segment — the same public TIFF 6.0
 * layout [[Tiff]] decodes, re-walked here with strict bounds checks
 * because the bytes are attacker-controlled crawl payloads.
 *
 * Supported tier: baseline JPEG segment walk to APP1, both byte
 * orders, SHORT/LONG/ASCII entry types, inline and offset value
 * placement, IFD0 + the 0x8769 Exif sub-IFD. A JPEG without an Exif
 * APP1 yields the ABSENT meta (orientation -1, empty strings, -1
 * dims) — triage wants a row, not an exception. Loud NAMED failures:
 * non-JPEG payloads, truncated segments, a malformed TIFF header or
 * IFD inside an Exif block that IS present.
 *
 * 100 TB shape: per-payload linear walk over header segments only
 * (entropy-coded data untouched) — pure per-row CPU, blobs never
 * shuffle.
 */
object Exif {

  /** Extracted triage fields; -1 / "" = absent. */
  final case class ExifMeta(orientation: Int, make: String, model: String,
      dateTime: String, pixelX: Int, pixelY: Int)

  val Absent: ExifMeta = ExifMeta(-1, "", "", "", -1, -1)

  // ------------------------------------------------------------- decode

  def exifMeta(p: Array[Byte]): ExifMeta = {
    require(Jpeg.isJpeg(p), "not a JPEG payload (no SOI)")
    var at = 2
    while (at + 4 <= p.length) {
      require((p(at) & 0xFF) == 0xFF, f"bad JPEG marker at byte $at")
      val marker = p(at + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return Absent // EOI / SOS
      require(marker != 0xD8, "stray SOI inside the segment walk")
      val len = ((p(at + 2) & 0xFF) << 8) | (p(at + 3) & 0xFF)
      require(len >= 2 && at + 2 + len <= p.length,
        s"truncated JPEG segment at byte $at (len $len)")
      if (marker == 0xE1 && len >= 8 &&
          p(at + 4) == 'E' && p(at + 5) == 'x' && p(at + 6) == 'i' &&
          p(at + 7) == 'f' && p(at + 8) == 0 && p(at + 9) == 0)
        return parseTiffBlock(p, at + 10, at + 2 + len)
      at += 2 + len
    }
    Absent
  }

  private def parseTiffBlock(p: Array[Byte], start: Int, end: Int): ExifMeta = {
    require(end - start >= 8, "truncated Exif TIFF header")
    val big = (p(start) & 0xFF, p(start + 1) & 0xFF) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case (a, b) => throw new IllegalArgumentException(
        f"bad Exif byte-order mark 0x$a%02X 0x$b%02X")
    }
    def u16(at: Int): Int = {
      require(at >= start && at + 2 <= end, s"Exif read past block at $at")
      if (big) ((p(at) & 0xFF) << 8) | (p(at + 1) & 0xFF)
      else ((p(at + 1) & 0xFF) << 8) | (p(at) & 0xFF)
    }
    def u32(at: Int): Int = {
      require(at >= start && at + 4 <= end, s"Exif read past block at $at")
      if (big) ((p(at) & 0xFF) << 24) | ((p(at + 1) & 0xFF) << 16) |
        ((p(at + 2) & 0xFF) << 8) | (p(at + 3) & 0xFF)
      else ((p(at + 3) & 0xFF) << 24) | ((p(at + 2) & 0xFF) << 16) |
        ((p(at + 1) & 0xFF) << 8) | (p(at) & 0xFF)
    }
    require(u16(start + 2) == 42, "bad Exif TIFF magic (want 42)")

    var orientation = -1
    var make = ""
    var model = ""
    var dateTime = ""
    var px = -1
    var py = -1

    /** One entry's integer value (SHORT/LONG count 1). */
    def intValue(entryAt: Int): Int = u16(entryAt + 2) match {
      case 3 => u16(entryAt + 8) // SHORT: left-justified in the field
      case 4 => u32(entryAt + 8)
      case t => throw new IllegalArgumentException(
        s"Exif tag ${u16(entryAt)}: unsupported integer type $t")
    }

    /** One entry's ASCII value (inline when count <= 4, else offset). */
    def asciiValue(entryAt: Int): String = {
      require(u16(entryAt + 2) == 2,
        s"Exif tag ${u16(entryAt)}: expected ASCII type")
      val count = u32(entryAt + 4)
      require(count >= 0 && count <= 65536,
        s"Exif ASCII value of $count bytes exceeds the 64 KiB cap")
      val at = if (count <= 4) entryAt + 8 else start + u32(entryAt + 8)
      require(at >= start && at + count <= end,
        s"Exif ASCII value overruns the block")
      val raw = new String(p, at, count,
        java.nio.charset.StandardCharsets.US_ASCII)
      raw.takeWhile(_ != '\u0000')
    }

    def walkIfd(ifdAt: Int, isExifIfd: Boolean): Unit = {
      val n = u16(ifdAt)
      require(n >= 0 && n <= 4096, s"bad Exif IFD entry count $n")
      var i = 0
      while (i < n) {
        val e = ifdAt + 2 + 12 * i
        u16(e) match {
          case 0x010F if !isExifIfd => make = asciiValue(e)
          case 0x0110 if !isExifIfd => model = asciiValue(e)
          case 0x0112 if !isExifIfd => orientation = intValue(e)
          case 0x8769 if !isExifIfd =>
            walkIfd(start + u32(e + 8), isExifIfd = true)
          case 0x9003 if isExifIfd => dateTime = asciiValue(e)
          case 0xA002 if isExifIfd => px = intValue(e)
          case 0xA003 if isExifIfd => py = intValue(e)
          case _ => () // any other tag: skip (thumbnails, GPS, ...)
        }
        i += 1
      }
    }
    walkIfd(start + u32(start + 4), isExifIfd = false)
    ExifMeta(orientation, make, model, dateTime, px, py)
  }

  // ------------------------------------------------------------- encode

  /** Splice an APP1 Exif segment (IFD0: Make/Model/Orientation + the
   *  0x8769 sub-IFD: DateTimeOriginal/PixelX/PixelY) right after a
   *  JPEG's SOI. Deterministic layout so oracles replay the fields. */
  def withExif(jpeg: Array[Byte], orientation: Int, make: String,
      model: String, dateTime: String, pixelX: Int, pixelY: Int,
      bigEndian: Boolean): Array[Byte] = {
    require(Jpeg.isJpeg(jpeg), "withExif needs a JPEG payload")
    val o = new java.io.ByteArrayOutputStream(jpeg.length + 256)
    def w16be(v: Int): Unit = { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }

    // --- TIFF block (offsets relative to its own start) ---
    val t = new java.io.ByteArrayOutputStream(192)
    def w16(v: Int): Unit =
      if (bigEndian) { t.write((v >> 8) & 0xFF); t.write(v & 0xFF) }
      else { t.write(v & 0xFF); t.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16((v >> 16) & 0xFFFF); w16(v & 0xFFFF) }
      else { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    val makeB = (make + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val modelB = (model + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val dateB = (dateTime + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val ifd0At = 8
    val ifd0Len = 2 + 4 * 12 + 4
    val exifIfdAt = ifd0At + ifd0Len
    val exifIfdLen = 2 + 3 * 12 + 4
    val dataAt = exifIfdAt + exifIfdLen
    // the data area holds ONLY the strings too long for inline
    // placement — an inline string must not reserve (shift) offsets
    var nextData = dataAt
    def reserve(b: Array[Byte]): Int = {
      val at = nextData
      if (b.length > 4) nextData += b.length
      at
    }
    val makeAt = reserve(makeB)
    val modelAt = reserve(modelB)
    val dateAt = reserve(dateB)
    def ascii(tag: Int, b: Array[Byte], at: Int): Unit = {
      w16(tag); w16(2); w32(b.length)
      if (b.length <= 4) { // inline, left-justified, zero-padded
        var i = 0
        while (i < 4) { t.write(if (i < b.length) b(i) else 0); i += 1 }
      } else w32(at)
    }
    // header
    if (bigEndian) { t.write('M'); t.write('M') }
    else { t.write('I'); t.write('I') }
    w16(42); w32(ifd0At)
    // IFD0: Make, Model, Orientation, ExifIFD (ascending tag order)
    w16(4)
    ascii(0x010F, makeB, makeAt)
    ascii(0x0110, modelB, modelAt)
    w16(0x0112); w16(3); w32(1)
    w16(orientation); w16(0) // SHORT left-justified
    w16(0x8769); w16(4); w32(1); w32(exifIfdAt)
    w32(0) // next IFD: none
    // Exif sub-IFD: DateTimeOriginal, PixelX, PixelY
    w16(3)
    ascii(0x9003, dateB, dateAt)
    w16(0xA002); w16(4); w32(1); w32(pixelX)
    w16(0xA003); w16(4); w32(1); w32(pixelY)
    w32(0)
    // data area (strings too long for inline placement)
    if (makeB.length > 4) t.write(makeB, 0, makeB.length)
    if (modelB.length > 4) t.write(modelB, 0, modelB.length)
    if (dateB.length > 4) t.write(dateB, 0, dateB.length)
    val tiff = t.toByteArray

    // --- assemble: SOI, APP1(Exif), rest of the original JPEG ---
    o.write(0xFF); o.write(0xD8)
    o.write(0xFF); o.write(0xE1)
    // the JPEG segment length is 16-bit; oversize strings would wrap it
    // and silently emit a corrupt fixture instead of failing by name
    require(2 + 6 + tiff.length <= 0xFFFF,
      s"Exif APP1 payload ${tiff.length} B overflows the 16-bit JPEG " +
        "segment length")
    w16be(2 + 6 + tiff.length)
    o.write('E'); o.write('x'); o.write('i'); o.write('f')
    o.write(0); o.write(0)
    o.write(tiff, 0, tiff.length)
    o.write(jpeg, 2, jpeg.length - 2)
    o.toByteArray
  }
}
