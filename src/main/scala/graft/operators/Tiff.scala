package graft.operators

/**
 * Real baseline TIFF codec — the fifth image format next to BMP, [[Png]],
 * [[Jpeg]] and [[Gif]], and the one that exercises BOTH byte orders
 * (II little-endian and MM big-endian headers). Pure byte arithmetic:
 * header + IFD walk + strip assembly; TIFF is lossless for uncompressed
 * data, so the round-trip is bit-exact and the DuckDB oracle replays
 * decoded byte sums from hex digests (`mm_tiff_roundtrip`).
 *
 * Supported tier: uncompressed (Compression=1) 8-bit grayscale
 * (Photometric 0/1, MinIsBlack/MinIsWhite) and RGB/RGBA (Photometric 2),
 * chunky planar config, any strip layout, II and MM byte orders, first
 * IFD only (multi-page files decode page 1 — the thumbnail-pipeline
 * contract, same as GIF's first frame). Out of tier — NAMED rejections:
 * LZW/PackBits/JPEG-in-TIFF compression, palette TIFF, planar config 2,
 * tiled TIFF, bit depths other than 8.
 *
 * 100 TB shape: partition-local per payload inside
 * [[Multimodal.decodeImage]]'s batched loop — no shuffle, blobs never
 * move.
 */
object Tiff {

  def isTiff(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 &&
      ((p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42))

  private final class Reader(p: Array[Byte], littleEndian: Boolean) {
    def u16(at: Int): Int = {
      require(at >= 0 && at + 1 < p.length, s"truncated TIFF at $at")
      if (littleEndian) (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
      else ((p(at) & 0xFF) << 8) | (p(at + 1) & 0xFF)
    }
    def u32(at: Int): Int = {
      require(at >= 0 && at + 3 < p.length, s"truncated TIFF at $at")
      val v =
        if (littleEndian)
          (p(at) & 0xFFL) | ((p(at + 1) & 0xFFL) << 8) |
            ((p(at + 2) & 0xFFL) << 16) | ((p(at + 3) & 0xFFL) << 24)
        else
          ((p(at) & 0xFFL) << 24) | ((p(at + 1) & 0xFFL) << 16) |
            ((p(at + 2) & 0xFFL) << 8) | (p(at + 3) & 0xFFL)
      require(v <= Int.MaxValue, s"TIFF offset/value $v too large")
      v.toInt
    }
  }

  /** One IFD entry's integer value(s). SHORT(3) and LONG(4) supported;
   *  values beyond the 4-byte inline slot follow the offset. */
  private def entryValues(r: Reader, p: Array[Byte], entryAt: Int): Array[Int] = {
    val typ = r.u16(entryAt + 2)
    val count = r.u32(entryAt + 4)
    require(typ == 3 || typ == 4, s"unsupported TIFF entry type $typ")
    val width = if (typ == 3) 2 else 4
    require(count >= 1 && count.toLong * width <= 64 * 1024 * 1024,
      s"bad TIFF entry count $count")
    val base =
      if (count * width <= 4) entryAt + 8
      else r.u32(entryAt + 8)
    Array.tabulate(count)(i =>
      if (typ == 3) r.u16(base + 2 * i) else r.u32(base + 4 * i))
  }

  /** (width, height, channels, "tiff", row-major top-down floats in
   *  [0,1]) — channels 1 for grayscale, 3/4 for RGB/RGBA. */
  def decodeTiff(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
    require(isTiff(p), "not a TIFF payload")
    val le = p(0) == 'I'
    val r = new Reader(p, le)
    val ifdAt = r.u32(4)
    val n = r.u16(ifdAt)
    require(n >= 1 && n <= 4096, s"bad TIFF IFD entry count $n")
    var w = 0; var h = 0; var spp = 1; var compression = 1
    var photometric = 1; var planar = 1
    var bits: Array[Int] = Array(8)
    var stripOffsets: Array[Int] = null
    var stripCounts: Array[Int] = null
    var rowsPerStrip = Int.MaxValue
    var tiled = false
    var palette = false
    var i = 0
    while (i < n) {
      val at = ifdAt + 2 + 12 * i
      val tag = r.u16(at)
      tag match {
        case 256 => w = entryValues(r, p, at)(0)
        case 257 => h = entryValues(r, p, at)(0)
        case 258 => bits = entryValues(r, p, at)
        case 259 => compression = entryValues(r, p, at)(0)
        case 262 => photometric = entryValues(r, p, at)(0)
        case 273 => stripOffsets = entryValues(r, p, at)
        case 277 => spp = entryValues(r, p, at)(0)
        case 278 => rowsPerStrip = entryValues(r, p, at)(0)
        case 279 => stripCounts = entryValues(r, p, at)
        case 284 => planar = entryValues(r, p, at)(0)
        case 320 => palette = true
        case 322 | 323 | 324 | 325 => tiled = true
        case _ => () // resolution, software, etc.: skip
      }
      i += 1
    }
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"implausible TIFF dimensions ${w}x$h (cap 2^26 pixels)")
    require(compression == 1, compression match {
      case 5 => "LZW-compressed TIFF — unsupported tier: uncompressed only"
      case 32773 => "PackBits TIFF — unsupported tier: uncompressed only"
      case 6 | 7 => "JPEG-in-TIFF — unsupported tier: uncompressed only"
      case c => s"TIFF compression $c — unsupported tier: uncompressed only"
    })
    require(!tiled, "tiled TIFF — unsupported tier: strips only")
    require(!palette && photometric != 3,
      "palette TIFF — unsupported tier: gray/RGB only")
    require(photometric <= 2,
      s"TIFF photometric $photometric — unsupported tier: gray/RGB only")
    require(planar == 1, "planar TIFF (PlanarConfiguration=2) — " +
      "unsupported tier: chunky only")
    require(w > 0 && h > 0, s"bad TIFF dimensions ${w}x$h")
    require(spp >= 1 && spp <= 4 && (photometric == 2) == (spp >= 3),
      s"TIFF samples/pixel $spp inconsistent with photometric $photometric")
    require(bits.forall(_ == 8),
      s"${bits.mkString("/")}-bit TIFF — unsupported tier: 8-bit only")
    require(stripOffsets != null && stripCounts != null &&
      stripOffsets.length == stripCounts.length,
      "TIFF missing strip offsets/byte counts")
    require(w.toLong * h * spp <= Int.MaxValue, "TIFF too large to decode")
    val rowBytes = w * spp
    val data = new Array[Byte](h * rowBytes)
    val rps = math.max(1, math.min(rowsPerStrip, h))
    require(stripOffsets.length == (h + rps - 1) / rps,
      s"TIFF strip count ${stripOffsets.length} inconsistent with " +
        s"$h rows at $rps rows/strip")
    var s = 0
    var row = 0
    while (s < stripOffsets.length) {
      val rows = math.min(rps, h - row)
      val need = rows * rowBytes
      require(stripCounts(s) == need,
        s"TIFF strip $s holds ${stripCounts(s)} bytes, expected $need")
      require(stripOffsets(s) >= 0 &&
        stripOffsets(s).toLong + need <= p.length,
        s"truncated TIFF strip $s")
      System.arraycopy(p, stripOffsets(s), data, row * rowBytes, need)
      row += rows
      s += 1
    }
    val px = new Array[Float](h * rowBytes)
    val invert = photometric == 0 // MinIsWhite
    var j = 0
    while (j < px.length) {
      val v = data(j) & 0xFF
      px(j) = (if (invert) 255 - v else v) / 255.0f
      j += 1
    }
    val channels = if (photometric == 2) spp else 1
    // gray with spp > 1 (extra samples) — keep only the first sample
    if (photometric != 2 && spp > 1) {
      val g = new Array[Float](w * h)
      var k = 0
      while (k < w * h) { g(k) = px(k * spp); k += 1 }
      return (w, h, 1, "tiff", g)
    }
    (w, h, channels, "tiff", px)
  }

  /** Uncompressed chunky TIFF from row-major top-down samples
   *  (h·w·channels bytes, channels 1 or 3), single strip; `bigEndian`
   *  picks the MM byte order so round-trip tests cover both. */
  def encodeTiff(w: Int, h: Int, samples: Array[Byte], channels: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 3, "channels must be 1 or 3")
    require(w > 0 && h > 0 && samples.length == w * h * channels,
      s"need w*h*channels = ${w * h * channels} bytes, got ${samples.length}")
    // 9 tags either way (width/length/bits/compression/photometric/
    // offsets/spp/rows-per-strip/byte-counts); RGB differs only in the
    // out-of-line BitsPerSample[3] array, not the entry count
    val nEntries = 9
    val ifdAt = 8
    val ifdLen = 2 + 12 * nEntries + 4
    val bpsExtraAt = ifdAt + ifdLen // SHORT[3] for RGB BitsPerSample
    val dataAt = if (channels == 3) bpsExtraAt + 6 else bpsExtraAt
    val o = new java.io.ByteArrayOutputStream(dataAt + samples.length)
    def w8(v: Int): Unit = o.write(v & 0xFF)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16(v >>> 16); w16(v) } else { w16(v); w16(v >>> 16) }
    if (bigEndian) { w8('M'); w8('M'); w8(0); w8(42) }
    else { w8('I'); w8('I'); w8(42); w8(0) }
    w32(ifdAt)
    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      // SHORT inline values sit in the HIGH half of the 4-byte slot on
      // big-endian files — write through the value's natural width
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    entry(256, 3, 1, w) // ImageWidth
    entry(257, 3, 1, h) // ImageLength
    if (channels == 3) entry(258, 3, 3, bpsExtraAt) // BitsPerSample[3]
    else entry(258, 3, 1, 8)
    entry(259, 3, 1, 1) // Compression: none
    entry(262, 3, 1, if (channels == 3) 2 else 1) // Photometric
    entry(273, 4, 1, dataAt) // StripOffsets
    entry(277, 3, 1, channels) // SamplesPerPixel
    entry(278, 3, 1, h) // RowsPerStrip: single strip
    entry(279, 4, 1, samples.length) // StripByteCounts
    w32(0) // next IFD: none
    if (channels == 3) { w16(8); w16(8); w16(8) }
    o.write(samples, 0, samples.length)
    o.toByteArray
  }
}
