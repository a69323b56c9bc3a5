package graft.operators

/**
 * Real baseline JPEG codec — decoder AND encoder — in pure integer/double
 * arithmetic with zero media-library dependencies (the PNG/BMP/WAV/AVI
 * discipline of [[Multimodal.Containers]], extended to the first
 * DCT-compressed format; no `java.desktop`, so it runs on jlink'd
 * headless JVMs). A real multimodal corpus is overwhelmingly JPEG, which
 * made this the widest remaining codec gap.
 *
 * Supported tier: baseline + extended sequential (SOF0/SOF1) AND
 * progressive (SOF2 — spectral selection, successive approximation,
 * DC/AC refinement scans, EOB runs) huffman DCT, 8-bit precision,
 * grayscale or 3-component YCbCr with sampling factors 1–2 (4:4:4,
 * 4:2:2, 4:4:0, 4:2:0), restart markers (DRI/RSTn), fill bytes. Out of
 * tier — rejected with NAMED errors, never a byte-offset panic:
 * lossless/differential SOFs, arithmetic coding (SOF9+/DAC), 12-bit
 * precision, >2 sampling factors.
 *
 * Exactness note for oracles: JPEG is lossy, but an image made of SOLID
 * 8×8 tiles encoded with an all-ones luma quant table survives the full
 * huffman+DCT round-trip EXACTLY (each block is DC-only: FDCT puts the
 * whole block into DC = 8·(c−128), quant 1 keeps it, the IDCT of a
 * DC-only block is DC/8 + 128 = c with double arithmetic ~1e-14 from the
 * integer, far inside rounding). `mm_jpeg_roundtrip` uses that to get a
 * hash-green DuckDB oracle over the REAL entropy-coded path; general AC
 * behavior is certified in the spec against the JDK's own ImageIO
 * decoder on the same bytes.
 *
 * 100 TB shape: decode/encode are partition-local per payload inside
 * [[Multimodal.decodeImage]]'s batched mapPartitions loop — no shuffle,
 * memory is one component plane set per image, blobs never move.
 */
object Jpeg {

  def isJpeg(p: Array[Byte]): Boolean =
    p != null && p.length >= 3 &&
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // M(u, x) = C(u)/2 · cos((2x+1)uπ/16); two separable passes give the
  // full 1/4·Cu·Cv scaling of the spec's IDCT (and its transpose, the FDCT)
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------- tables

  /** Annex K.1 luminance quantization table (zigzag order NOT applied —
   *  this is natural row-major as printed in the spec). */
  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (natural order). */
  val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** An all-ones quant table: DC-only blocks round-trip exactly. */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  // Annex K.3 huffman specs: (bits[1..16] code counts, values)
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  // --------------------------------------------------------- huffman core

  /** Canonical huffman table in the JPEG min/max-code form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // bits(1..16); code assignment per spec C.2
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 when no codes of that length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l)
          k += bits(l)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
      require(k == vals.length,
        s"huffman table: ${vals.length} values for $k codes")
    }
    // encoder side: value -> (code, length)
    lazy val encode: Map[Int, (Int, Int)] = {
      var m = Map.empty[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0) {
          var c = minCode(l)
          while (c <= maxCode(l)) {
            m += values(valPtr(l) + c - minCode(l)) -> ((c, l))
            c += 1
          }
        }
        l += 1
      }
      m
    }
  }

  private val DcLuma = new HuffTable(DcLumaBits, DcLumaVals)
  private val DcChroma = new HuffTable(DcChromaBits, DcChromaVals)
  private val AcLuma = new HuffTable(AcLumaBits, AcLumaVals)
  private val AcChroma = new HuffTable(AcChromaBits, AcChromaVals)

  /** Entropy-segment bit reader: big-endian bits, 0xFF00 byte stuffing,
   *  stops (loudly) at any real marker; RSTn consumed via [[restart]]. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < p.length, "truncated JPEG entropy data")
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < p.length, "truncated JPEG entropy data after 0xFF")
          val m = p(pos) & 0xFF
          require(m == 0x00,
            f"unexpected marker 0xFF$m%02X inside entropy data " +
              "(truncated scan or missing restart handling)")
          pos += 1
          b = 0xFF
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      require(pos + 1 < p.length, "truncated JPEG at restart marker")
      require((p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xFF) == (0xD0 | n),
        f"expected RST$n marker, found 0x${p(pos) & 0xFF}%02X${p(pos + 1) & 0xFF}%02X")
      pos += 2
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "corrupt JPEG huffman code")
      t.values(t.valPtr(l) + code - t.minCode(l))
    }

    /** RECEIVE + EXTEND (spec F.2.2.1). */
    def receiveExtend(s: Int): Int = {
      if (s == 0) 0
      else {
        val v = bits(s)
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }
    }
  }

  // --------------------------------------------------------------- decode

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  /** (width, height, channels, "jpeg", row-major top-down floats in
   *  [0,1]) — channels 1 for grayscale, 3 for YCbCr (converted to RGB).
   *  Handles baseline (SOF0), extended sequential (SOF1) AND progressive
   *  (SOF2) streams: all scans route through per-component quantized
   *  coefficient buffers (spectral selection + successive approximation:
   *  DC/AC first and refinement passes, EOB runs, restart resync), and
   *  the IDCT runs once at EOI — the libjpeg whole-image-buffer
   *  strategy, which also unifies the baseline path. */
  def decodeJpeg(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
    require(isJpeg(p), "not a JPEG payload")
    val quant = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var progressive = false
    var restartInterval = 0
    var at = 2
    var done = false
    // per-component quantized-coefficient buffers: natural order inside
    // each block, blocks MCU-padded (interleaved scans address the
    // padded grid; single-component scans the ceil(compDim/8) prefix)
    var coefs: Array[Array[Int]] = null
    var bwPad: Array[Int] = null
    var bhPad: Array[Int] = null
    var compBw: Array[Int] = null
    var compBh: Array[Int] = null
    var sawDc: Array[Boolean] = null
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0

    def u16(i: Int): Int = {
      require(i + 1 < p.length, "truncated JPEG segment length")
      ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
    }

    /** One entropy-coded scan starting right after its SOS segment;
     *  returns the offset of the next marker's 0xFF. */
    def decodeScan(q0: Int, dataAt: Int): Int = {
      require(comps != null, "JPEG SOS before SOF")
      val ns = p(q0) & 0xFF
      require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
      val scanComps = new Array[Int](ns)
      var i = 0
      while (i < ns) {
        val cs = p(q0 + 1 + 2 * i) & 0xFF
        val tt = p(q0 + 2 + 2 * i) & 0xFF
        val ci = comps.indexWhere(_.id == cs)
        require(ci >= 0, s"SOS names unknown component $cs")
        comps(ci).td = tt >> 4
        comps(ci).ta = tt & 0x0F
        require(comps(ci).td < 4 && comps(ci).ta < 4,
          s"bad huffman table ids ${comps(ci).td}/${comps(ci).ta} in SOS")
        scanComps(i) = ci
        i += 1
      }
      val ss = p(q0 + 1 + 2 * ns) & 0xFF
      val se = p(q0 + 2 + 2 * ns) & 0xFF
      val a = p(q0 + 3 + 2 * ns) & 0xFF
      val ah = a >> 4
      val al = a & 0x0F
      if (progressive) {
        require(ss <= 63 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
        if (ss == 0) require(se == 0, "progressive DC scan must have Se=0")
        else require(ns == 1, "progressive AC scan must be single-component")
        require(al <= 13 && (ah == 0 || ah == al + 1),
          s"bad successive approximation $ah/$al")
      } else {
        require(ss == 0 && se == 63 && ah == 0 && al == 0,
          s"sequential scan with progressive params $ss/$se/$ah/$al")
      }
      scanComps.foreach { ci =>
        val c = comps(ci)
        if (ss == 0 && ah == 0)
          require(dcTabs(c.td) != null,
            s"component ${c.id} uses undefined DC huffman table ${c.td}")
        if (se >= 1 && (ss > 0 || !progressive))
          require(acTabs(c.ta) != null,
            s"component ${c.id} uses undefined AC huffman table ${c.ta}")
        sawDc(ci) |= ss == 0
      }
      val reader = new BitReader(p, dataAt)
      val dcPred = new Array[Int](ns)
      var eobrun = 0
      val interleaved = ns > 1
      val unitsX = if (interleaved) mcusX else compBw(scanComps(0))
      val unitsY = if (interleaved) mcusY else compBh(scanComps(0))
      val totalUnits = unitsX * unitsY
      var unit = 0
      var rstN = 0
      val bandStart = math.max(ss, 1)
      while (unit < totalUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          reader.restart(rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }
        val uy = unit / unitsX
        val ux = unit % unitsX
        var si = 0
        while (si < ns) {
          val ci = scanComps(si)
          val c = comps(ci)
          val buf = coefs(ci)
          val nbx = if (interleaved) c.h else 1
          val nby = if (interleaved) c.v else 1
          var by = 0
          while (by < nby) {
            var bx = 0
            while (bx < nbx) {
              val blkX = if (interleaved) ux * c.h + bx else ux
              val blkY = if (interleaved) uy * c.v + by else uy
              val off = (blkY * bwPad(ci) + blkX) * 64
              if (ss == 0) {
                if (ah == 0) { // DC first / baseline DC
                  val t = reader.decode(dcTabs(c.td))
                  require(t <= 15, s"bad DC category $t")
                  dcPred(si) += reader.receiveExtend(t)
                  buf(off) = dcPred(si) << al
                } else { // DC refine: one appended magnitude bit
                  if (reader.bit() == 1) buf(off) |= (1 << al)
                }
              }
              if (se >= 1 && (ss > 0 || !progressive)) {
                if (ah == 0) { // AC first / baseline AC
                  if (eobrun > 0) eobrun -= 1
                  else {
                    var k = bandStart
                    var stop = false
                    while (k <= se && !stop) {
                      val rs = reader.decode(acTabs(c.ta))
                      val r = rs >> 4
                      val s = rs & 0x0F
                      if (s == 0) {
                        if (r == 15) k += 16 // ZRL
                        else {
                          eobrun = (1 << r) - 1
                          if (r > 0) eobrun += reader.bits(r)
                          stop = true
                        }
                      } else {
                        k += r
                        require(k <= se, "JPEG AC run past band end")
                        buf(off + Zigzag(k)) = reader.receiveExtend(s) << al
                        k += 1
                      }
                    }
                  }
                } else { // AC refine (spec G.1.2.3)
                  val p1 = 1 << al
                  val m1 = -(1 << al)
                  var k = bandStart
                  if (eobrun == 0) {
                    var stop = false
                    while (k <= se && !stop) {
                      val rs = reader.decode(acTabs(c.ta))
                      var r = rs >> 4
                      val s = rs & 0x0F
                      var newVal = 0
                      if (s != 0) {
                        require(s == 1, s"bad AC refinement size $s")
                        newVal = if (reader.bit() == 1) p1 else m1
                      } else if (r != 15) {
                        // FULL count here (unlike AC-first): the CURRENT
                        // block still consumes correction bits for its
                        // remaining band below, then decrements — an
                        // EOB0 with the -1 form skipped those bits and
                        // desynced the stream
                        eobrun = 1 << r
                        if (r > 0) eobrun += reader.bits(r)
                        stop = true
                      }
                      if (!stop) {
                        // advance past r zero-HISTORY positions, applying
                        // correction bits to every nonzero passed
                        var found = false
                        while (!found) {
                          require(k <= se, "AC refinement ran past band end")
                          val cv = buf(off + Zigzag(k))
                          if (cv != 0) {
                            if (reader.bit() == 1 && (cv & p1) == 0)
                              buf(off + Zigzag(k)) =
                                if (cv >= 0) cv + p1 else cv + m1
                            k += 1
                          } else if (r == 0) found = true
                          else { r -= 1; k += 1 }
                        }
                        if (newVal != 0) buf(off + Zigzag(k)) = newVal
                        k += 1
                      }
                    }
                  }
                  if (eobrun > 0) {
                    while (k <= se) {
                      val cv = buf(off + Zigzag(k))
                      if (cv != 0 && reader.bit() == 1 && (cv & p1) == 0)
                        buf(off + Zigzag(k)) =
                          if (cv >= 0) cv + p1 else cv + m1
                      k += 1
                    }
                    eobrun -= 1
                  }
                }
              }
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        unit += 1
      }
      // next marker: skip to the first 0xFF not followed by a stuffed 0x00
      var np = reader.pos
      while (np + 1 < p.length &&
          !((p(np) & 0xFF) == 0xFF && (p(np + 1) & 0xFF) != 0x00)) np += 1
      require(np + 1 < p.length, "truncated JPEG after scan")
      np
    }

    while (!done) {
      require(at + 1 < p.length, "truncated JPEG before EOI")
      require((p(at) & 0xFF) == 0xFF,
        f"expected marker at $at, found 0x${p(at) & 0xFF}%02X")
      val m = p(at + 1) & 0xFF
      at += 2
      m match {
        case 0xD8 | 0x01 => () // SOI / TEM: no payload
        case 0xFF => at -= 1 // fill byte before a marker (B.1.1.2)
        case r if r >= 0xD0 && r <= 0xD7 => () // stray RSTn: standalone
        case 0xD9 =>
          require(sawDc != null && sawDc.forall(identity),
            "JPEG hit EOI without a DC scan for every component")
          done = true
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xCB | 0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"JPEG coding process SOF 0x$m%02X — unsupported tier")
        case 0xC9 | 0xCA | 0xCC => throw new IllegalArgumentException(
          "arithmetic-coded JPEG — unsupported tier: huffman only")
        case _ =>
          val len = u16(at)
          require(len >= 2 && at + len <= p.length,
            f"truncated JPEG segment 0xFF$m%02X (len $len)")
          val end = at + len
          require(end <= p.length,
            f"truncated JPEG: segment 0xFF$m%02X claims $len B at $at " +
              s"of ${p.length}")
          var q = at + 2
          m match {
            case 0xDB => // DQT
              while (q < end) {
                val pq = (p(q) & 0xFF) >> 4
                val tq = p(q) & 0x0F
                require(tq < 4, s"bad quant table id $tq")
                require(pq <= 1, s"bad quant precision $pq")
                q += 1
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) {
                  val v = if (pq == 0) p(q) & 0xFF else u16(q)
                  q += (if (pq == 0) 1 else 2)
                  t(Zigzag(i)) = v
                  i += 1
                }
                quant(tq) = t
              }
            case 0xC0 | 0xC1 | 0xC2 => // baseline / ext. sequential / progressive
              require(comps == null, "duplicate SOF")
              progressive = m == 0xC2
              val precision = p(q) & 0xFF
              require(precision == 8,
                s"$precision-bit JPEG — unsupported tier: 8-bit only")
              h = u16(q + 1); w = u16(q + 3)
              require(w > 0 && h > 0, s"bad JPEG dimensions ${w}x$h")
              require(w.toLong * h <= (1L << 26),
                s"implausible JPEG dimensions ${w}x$h (cap 2^26 pixels)")
              val nc = p(q + 5) & 0xFF
              require(nc == 1 || nc == 3,
                s"$nc-component JPEG — unsupported tier: gray or YCbCr")
              comps = Array.tabulate(nc) { i =>
                val o = q + 6 + 3 * i
                val hv = p(o + 1) & 0xFF
                val c = Comp(p(o) & 0xFF, hv >> 4, hv & 0x0F, p(o + 2) & 0xFF)
                require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                  s"sampling factors ${c.h}x${c.v} — unsupported tier: 1-2")
                require(c.tq < 4, s"bad quant table id ${c.tq}")
                c
              }
              hmax = comps.map(_.h).max
              vmax = comps.map(_.v).max
              mcusX = (w + 8 * hmax - 1) / (8 * hmax)
              mcusY = (h + 8 * vmax - 1) / (8 * vmax)
              require(w.toLong * h * nc * 4 <= Int.MaxValue,
                "JPEG too large to decode")
              bwPad = comps.map(c => mcusX * c.h)
              bhPad = comps.map(c => mcusY * c.v)
              compBw = comps.map(c => ((w * c.h + hmax - 1) / hmax + 7) / 8)
              compBh = comps.map(c => ((h * c.v + vmax - 1) / vmax + 7) / 8)
              coefs = comps.indices
                .map(i => new Array[Int](bwPad(i) * bhPad(i) * 64)).toArray
              sawDc = new Array[Boolean](nc)
            case 0xC4 => // DHT
              while (q < end) {
                val tc = (p(q) & 0xFF) >> 4
                val th = p(q) & 0x0F
                require(tc <= 1 && th < 4, s"bad huffman table id $tc/$th")
                q += 1
                require(q + 16 <= end, "truncated JPEG DHT length table")
                val bits = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) {
                  bits(l) = p(q + l - 1) & 0xFF; total += bits(l); l += 1
                }
                q += 16
                require(q + total <= end,
                  s"truncated JPEG DHT: $total values claimed, " +
                    s"${end - q} bytes left in segment")
                val vals = Array.tabulate(total)(i => p(q + i) & 0xFF)
                q += total
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              }
            case 0xDD => restartInterval = u16(q)
            case 0xDA => at = decodeScan(q, end)
            case _ => () // APPn, COM, others: skip
          }
          if (m != 0xDA) at = end
      }
    }

    // all scans consumed: dequantize + IDCT every block into planes
    comps.foreach { c =>
      require(quant(c.tq) != null,
        s"component ${c.id} uses undefined quant table ${c.tq}")
    }
    val planeW = comps.indices.map(i => bwPad(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Byte](bwPad(i) * 8 * bhPad(i) * 8)).toArray
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = quant(comps(ci).tq)
      val buf = coefs(ci)
      val pw = planeW(ci)
      var blkY = 0
      while (blkY < bhPad(ci)) {
        var blkX = 0
        while (blkX < bwPad(ci)) {
          val off = (blkY * bwPad(ci) + blkX) * 64
          var i = 0
          while (i < 64) { coef(i) = buf(off + i) * qt(i); i += 1 }
          idct(coef, block)
          var y = 0
          while (y < 8) {
            val rowOff = (blkY * 8 + y) * pw + blkX * 8
            var x = 0
            while (x < 8) {
              planes(ci)(rowOff + x) = block(y * 8 + x).toByte
              x += 1
            }
            y += 1
          }
          blkX += 1
        }
        blkY += 1
      }
      ci += 1
    }

    // color conversion + crop to w×h
    val nch = comps.length
    val out = new Array[Float](w * h * nch)
    if (nch == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = (planes(0)(y * pw + x) & 0xFF) / 255.0f
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sy = y * c.v / vmax
            val sx = x * c.h / hmax
            planes(ci)(sy * planeW(ci) + sx) & 0xFF
          }
          val yy = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          val d = (y * w + x) * 3
          out(d) = clamp255(math.round(yy + 1.402 * cr)) / 255.0f
          out(d + 1) = clamp255(math.round(yy - 0.344136 * cb - 0.714136 * cr)) / 255.0f
          out(d + 2) = clamp255(math.round(yy + 1.772 * cb)) / 255.0f
          x += 1
        }
        y += 1
      }
    }
    (w, h, nch, "jpeg", out)
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Separable double IDCT of dequantized coefficients; output is
   *  level-shifted (+128), rounded and clamped to [0, 255].
   *
   *  Zero coefficients are SKIPPED, bit-identically: a zero term's
   *  contribution is `CosTab·0 = ±0.0`, and `s += ±0.0` never changes
   *  `s` (the accumulator starts at the +0.0 literal and IEEE-754
   *  round-to-nearest addition can never produce -0.0 from a +0.0
   *  start, so even the sign of zero matches; `+128.0` would erase it
   *  at the output anyway). Real and fixture JPEG blocks are sparse —
   *  DC-only blocks (the oracle carve-out shape) drop from 512 to 8
   *  multiplies, typical web blocks from 512 to ~100 — so this is the
   *  decode hot loop's biggest constant-factor lever without touching
   *  the arithmetic. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64) // zero-initialized: skipped rows stay 0.0
    var y = 0
    while (y < 8) { // rows: over u
      // all-zero coefficient rows contribute an all-zero tmp row
      var any = false
      var u0 = 0
      while (u0 < 8 && !any) { if (coef(y * 8 + u0) != 0) any = true; u0 += 1 }
      if (any) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) {
            val c = coef(y * 8 + u)
            if (c != 0) s += CosTab(u)(x) * c
            u += 1
          }
          tmp(y * 8 + x) = s
          x += 1
        }
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: over v
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val t = tmp(v * 8 + x)
          if (t != 0.0) s += CosTab(v)(yy) * t
          v += 1
        }
        out(yy * 8 + x) = clamp255(math.round(s + 128.0))
        yy += 1
      }
      x += 1
    }
  }

  // --------------------------------------------------------------- encode

  private final class BitWriter(o: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          o.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) o.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (spec F.1.2.3). */
    def flush(): Unit = {
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        o.write(acc & 0xFF)
        if ((acc & 0xFF) == 0xFF) o.write(0x00)
        acc = 0; nbits = 0
      }
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def fdct(block: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // cols first: over y
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += CosTab(v)(y) * block(y * 8 + x); y += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var vv = 0
    while (vv < 8) { // rows: over x
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += CosTab(u)(x) * tmp(vv * 8 + x); x += 1 }
        out(vv * 8 + u) = s
        u += 1
      }
      vv += 1
    }
  }

  private def encodeBlock(bw: BitWriter, samples: Array[Int],
      qt: Array[Int], dcTab: HuffTable, acTab: HuffTable,
      dcPred: Int): Int = {
    val shifted = new Array[Int](64)
    var i = 0
    while (i < 64) { shifted(i) = samples(i) - 128; i += 1 }
    val freq = new Array[Double](64)
    fdct(shifted, freq)
    val q = new Array[Int](64) // zigzag order
    i = 0
    while (i < 64) {
      val n = Zigzag(i)
      q(i) = math.round(freq(n) / qt(n)).toInt
      i += 1
    }
    // DC
    val diff = q(0) - dcPred
    val s = category(diff)
    val (dcCode, dcLen) = dcTab.encode(s)
    bw.put(dcCode, dcLen)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    // AC
    var k = 1
    var run = 0
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (c, l) = acTab.encode(0xF0); bw.put(c, l); run -= 16 // ZRL
        }
        val sz = category(q(k))
        val (c, l) = acTab.encode((run << 4) | sz)
        bw.put(c, l)
        bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acTab.encode(0x00); bw.put(c, l) } // EOB
    q(0)
  }

  private def writeSeg(o: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Int]): Unit = {
    o.write(0xFF); o.write(marker)
    val len = body.length + 2
    o.write((len >> 8) & 0xFF); o.write(len & 0xFF)
    body.foreach(b => o.write(b & 0xFF))
  }

  private def quantSeg(id: Int, qt: Array[Int]): Array[Int] =
    Array(id) ++ (0 until 64).map(i => qt(Zigzag(i)))

  private def dhtSeg(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ bits.drop(1) ++ vals

  /** Grayscale baseline JPEG from row-major top-down 8-bit samples.
   *  `quantTable` in natural order; [[UnitQuant]] + solid 8×8 tiles give
   *  an EXACT round-trip (see the object Scaladoc). `restartMcus > 0`
   *  emits DRI + RSTn markers every that many MCUs. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
      quantTable: Array[Int] = StdLumaQuant,
      restartMcus: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"need w*h = ${w * h} gray bytes, got ${gray.length}")
    // <= 255, not the spec's 65535: quantSeg always declares Pq=0
    // (8-bit entries), so a 256..65535 value would quantize blocks
    // with q but declare q & 0xFF — a silently corrupted round-trip.
    require(quantTable.length == 64 && quantTable.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1, 255] (8-bit DQT emitted)")
    val o = new java.io.ByteArrayOutputStream(gray.length / 2 + 512)
    o.write(0xFF); o.write(0xD8) // SOI
    writeSeg(o, 0xDB, quantSeg(0, quantTable))
    writeSeg(o, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF,
      (w >> 8) & 0xFF, w & 0xFF, 1, 1, 0x11, 0))
    writeSeg(o, 0xC4, dhtSeg(0, 0, DcLumaBits, DcLumaVals))
    writeSeg(o, 0xC4, dhtSeg(1, 0, AcLumaBits, AcLumaVals))
    if (restartMcus > 0)
      writeSeg(o, 0xDD, Array((restartMcus >> 8) & 0xFF, restartMcus & 0xFF))
    writeSeg(o, 0xDA, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(o)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val block = new Array[Int](64)
    var dcPred = 0
    var mcu = 0
    var rstN = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartMcus > 0 && mcu > 0 && mcu % restartMcus == 0) {
        bw.flush()
        o.write(0xFF); o.write(0xD0 | rstN)
        rstN = (rstN + 1) & 7
        dcPred = 0
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          // edge blocks replicate the last row/column (the standard pad)
          val sy = math.min(my * 8 + y, h - 1)
          val sx = math.min(mx * 8 + x, w - 1)
          block(y * 8 + x) = gray(sy * w + sx) & 0xFF
          x += 1
        }
        y += 1
      }
      dcPred = encodeBlock(bw, block, quantTable, DcLuma, AcLuma, dcPred)
      mcu += 1
    }
    bw.flush()
    o.write(0xFF); o.write(0xD9) // EOI
    o.toByteArray
  }

  /** Color baseline JPEG from row-major top-down RGB bytes (h·w·3),
   *  standard Annex K tables scaled by `quality` (1–100, 50 = the
   *  tables as printed; libjpeg's scaling law). `subsample420` emits
   *  the 4:2:0 layout real pipelines use (2×2 luma blocks + one
   *  2×2-averaged Cb and Cr block per MCU); false keeps 4:4:4. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte], quality: Int = 90,
      subsample420: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need w*h*3 = ${w * h * 3} RGB bytes, got ${rgb.length}")
    require(quality >= 1 && quality <= 100, "quality must be in [1, 100]")
    val scale = if (quality < 50) 5000 / quality else 200 - quality * 2
    def scaled(t: Array[Int]): Array[Int] =
      t.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
    val qLuma = scaled(StdLumaQuant)
    val qChroma = scaled(StdChromaQuant)
    val lumaHv = if (subsample420) 0x22 else 0x11
    val o = new java.io.ByteArrayOutputStream(rgb.length / 3 + 1024)
    o.write(0xFF); o.write(0xD8)
    writeSeg(o, 0xDB, quantSeg(0, qLuma))
    writeSeg(o, 0xDB, quantSeg(1, qChroma))
    writeSeg(o, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF,
      (w >> 8) & 0xFF, w & 0xFF, 3,
      1, lumaHv, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSeg(o, 0xC4, dhtSeg(0, 0, DcLumaBits, DcLumaVals))
    writeSeg(o, 0xC4, dhtSeg(1, 0, AcLumaBits, AcLumaVals))
    writeSeg(o, 0xC4, dhtSeg(0, 1, DcChromaBits, DcChromaVals))
    writeSeg(o, 0xC4, dhtSeg(1, 1, AcChromaBits, AcChromaVals))
    writeSeg(o, 0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val bw = new BitWriter(o)
    // full-image YCbCr planes with edge replication up to the MCU grid
    val mcu = if (subsample420) 16 else 8
    val pw = (w + mcu - 1) / mcu * mcu
    val ph = (h + mcu - 1) / mcu * mcu
    val yP = new Array[Int](pw * ph)
    val cbP = new Array[Int](pw * ph)
    val crP = new Array[Int](pw * ph)
    var yy = 0
    while (yy < ph) {
      var xx = 0
      while (xx < pw) {
        val i = (math.min(yy, h - 1) * w + math.min(xx, w - 1)) * 3
        val r = rgb(i) & 0xFF
        val g = rgb(i + 1) & 0xFF
        val b = rgb(i + 2) & 0xFF
        val j = yy * pw + xx
        yP(j) = clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * b))
        cbP(j) = clamp255(math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
        crP(j) = clamp255(math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
        xx += 1
      }
      yy += 1
    }
    val blk = new Array[Int](64)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    def lumaBlock(px0: Int, py0: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          blk(y * 8 + x) = yP((py0 + y) * pw + px0 + x)
          x += 1
        }
        y += 1
      }
      dcY = encodeBlock(bw, blk, qLuma, DcLuma, AcLuma, dcY)
    }
    def chromaBlock(plane: Array[Int], px0: Int, py0: Int,
        avg: Boolean, pred: Int): Int = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          blk(y * 8 + x) =
            if (!avg) plane((py0 + y) * pw + px0 + x)
            else { // 2x2 mean, rounded
              val sy = py0 + 2 * y
              val sx = px0 + 2 * x
              (plane(sy * pw + sx) + plane(sy * pw + sx + 1) +
                plane((sy + 1) * pw + sx) + plane((sy + 1) * pw + sx + 1) + 2) / 4
            }
          x += 1
        }
        y += 1
      }
      encodeBlock(bw, blk, qChroma, DcChroma, AcChroma, pred)
    }
    val mcusX = pw / mcu
    val mcusY = ph / mcu
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (subsample420) {
          lumaBlock(mx * 16, my * 16)
          lumaBlock(mx * 16 + 8, my * 16)
          lumaBlock(mx * 16, my * 16 + 8)
          lumaBlock(mx * 16 + 8, my * 16 + 8)
          dcCb = chromaBlock(cbP, mx * 16, my * 16, avg = true, dcCb)
          dcCr = chromaBlock(crP, mx * 16, my * 16, avg = true, dcCr)
        } else {
          lumaBlock(mx * 8, my * 8)
          dcCb = chromaBlock(cbP, mx * 8, my * 8, avg = false, dcCb)
          dcCr = chromaBlock(crP, mx * 8, my * 8, avg = false, dcCr)
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    o.write(0xFF); o.write(0xD9)
    o.toByteArray
  }
}
