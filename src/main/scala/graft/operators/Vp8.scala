package graft.operators

/**
 * Lossy VP8 KEY-FRAME decode (RFC 6386) — the coding layer of real-web
 * lossy WebP, the majority `.webp` tier a crawl pipeline hits right
 * after JPEG/PNG. SURVEY.md §2.6 north-star addition; the reference has
 * no media surface (its transforms are opaque WASM guests). Pure
 * integer arithmetic, no media libraries.
 *
 * Implemented (key frames / intra only — which is the whole format for
 * WebP stills, since a WebP `VP8 ` chunk IS one key frame):
 *
 *  - boolean (range) decoder + encoder (§7) — round-trip pinned on
 *    random bit/probability sequences;
 *  - uncompressed frame tag + key-frame dimension header (§9.1);
 *  - first-partition parse: segmentation (map + quant/filter feature
 *    deltas, abs or delta mode), loop-filter params, multi-partition
 *    token layout, quantizer indices with all five deltas, coefficient
 *    probability updates, skip flag (§9.2–§9.11);
 *  - per-MB intra mode decode (16×16 DC/V/H/TM, B_PRED with all ten
 *    4×4 sub-modes, chroma DC/V/H/TM) with the key-frame mode trees;
 *  - coefficient token decode over the 12-token tree with the
 *    band/context model incl. the no-EOB-after-zero rule, category
 *    extra bits, per-plane above/left nonzero contexts, skip-MB
 *    context resets (§13);
 *  - dequantization with segment/delta-resolved quantizers and the
 *    Y2 (dc×2, ac×155/100 floor 8) and chroma-DC (≤132) adjustments;
 *  - exact integer inverse WHT + inverse DCT (§14.3) and intra
 *    reconstruction with 127/129 frame-edge rules and clamping.
 *
 * NAMED SEAMS (loud, like `Mp3.scala`'s Layer-III seam):
 *  - CONFORMANCE OF DEFAULT PROBABILITY TABLES: RFC 6386's appendix
 *    data (default coefficient probabilities §13.5, their update
 *    probabilities §13.4, and the key-frame B-mode probabilities) is
 *    ~3000 constants that could not be sourced in this offline
 *    environment, and no independent VP8 decoder exists in-container
 *    to certify against (the JPEG codec had ImageIO; VP8 has nothing).
 *    [[Vp8.Vp8Tables]] therefore ships STRUCTURED PLACEHOLDER values
 *    for exactly those three tables — clearly labeled there — which
 *    the fixture encoder shares, so every behavior is
 *    round-trip-certified and oracle-replayable, but third-party VP8
 *    streams will desync at the first token until the placeholders are
 *    replaced with the RFC appendix data (a drop-in data swap; no code
 *    change). Every OTHER table (trees, zigzag, bands, category
 *    probs/bases, mode probs, quantizer lookups) is the published spec
 *    data.
 *  - (r14: the LOOP FILTER seam is CLOSED — §15.2 simple and §15.3
 *    normal filters, both edge classes, segment/delta-resolved per-MB
 *    levels, sharpness-adjusted interior limits and the key-frame HEV
 *    thresholds all reconstruct; §15 is normative RFC BODY text, so no
 *    appendix data was needed. Pinned by hand-computed edge fixtures
 *    in Vp8Spec.)
 *  - B_PRED above-right/above-left edge defaults follow the common
 *    decoder behavior (127 above / 129 left / replicate at the frame's
 *    right edge); pinned by spec against hand-computed pixels.
 *  - Interframes (golden/altref machinery) are meaningless for WebP
 *    stills and rejected by frame type.
 *
 * Output contract: (w, h, 3, "yuv420", row-major Y,U,V interleaved
 * floats in [0,1]) — chroma is upsampled by 2×2 REPLICATION (nearest),
 * the only deterministic choice an oracle can replay exactly; RGB
 * conversion is a caller policy (BT.601), not a decode step.
 *
 * 100 TB shape: per-row linear decode inside [[Multimodal]]'s batched
 * `mapPartitions` — blobs collapse to features before anything
 * shuffles, same as every other codec here.
 */
object Vp8 {

  // ------------------------------------------------------------ tables

  /** RFC 6386 constant data. Tables marked PLACEHOLDER are the named
   *  conformance seam described in the [[Vp8]] Scaladoc. */
  object Vp8Tables {
    /** §13.5 zigzag order of the 16 coefficients. */
    val Zigzag: Array[Int] =
      Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

    /** §13.3 coefficient position → probability band. */
    val CoeffBands: Array[Int] =
      Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

    // token indices
    val DCT_0 = 0; val DCT_1 = 1; val DCT_2 = 2; val DCT_3 = 3; val DCT_4 = 4
    val CAT1 = 5; val CAT2 = 6; val CAT3 = 7; val CAT4 = 8; val CAT5 = 9
    val CAT6 = 10; val EOB = 11

    /** §13.2 coefficient token tree (negative/zero entries = leaves). */
    val CoeffTree: Array[Int] = Array(
      -EOB, 2,
      -DCT_0, 4,
      -DCT_1, 6,
      8, 12,
      -DCT_2, 10,
      -DCT_3, -DCT_4,
      14, 16,
      -CAT1, -CAT2,
      18, 20,
      -CAT3, -CAT4,
      -CAT5, -CAT6)

    /** §13.2 category extra-bit probabilities and base values. */
    val CatProbs: Array[Array[Int]] = Array(
      Array(159),
      Array(165, 145),
      Array(173, 148, 140),
      Array(176, 155, 140, 135),
      Array(180, 157, 141, 134, 130),
      Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
    val CatBases: Array[Int] = Array(5, 7, 11, 19, 35, 67)

    // intra modes
    val DC_PRED = 0; val V_PRED = 1; val H_PRED = 2; val TM_PRED = 3
    val B_PRED = 4
    // 4x4 sub-modes
    val B_DC = 0; val B_TM = 1; val B_VE = 2; val B_HE = 3; val B_LD = 4
    val B_RD = 5; val B_VR = 6; val B_VL = 7; val B_HD = 8; val B_HU = 9

    /** §11.2 key-frame luma mode tree + probabilities. */
    val KfYModeTree: Array[Int] =
      Array(-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
    val KfYModeProbs: Array[Int] = Array(145, 156, 163, 128)

    /** §11.2 chroma mode tree + key-frame probabilities. */
    val UvModeTree: Array[Int] =
      Array(-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
    val KfUvModeProbs: Array[Int] = Array(142, 114, 183)

    /** §11.2 4x4 sub-mode tree. */
    val BModeTree: Array[Int] = Array(
      -B_DC, 2,
      -B_TM, 4,
      -B_VE, 6,
      8, 12,
      -B_HE, 10,
      -B_RD, -B_VR,
      -B_LD, 14,
      -B_VL, 16,
      -B_HD, -B_HU)

    /** §9.6 / §14.1 quantizer lookups (index 0..127), published spec
     *  data. */
    val DcQLookup: Array[Int] = Array(
      4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
      18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
      29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
      44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
      59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
      75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
      91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
      116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
      145, 148, 151, 154, 157)

    val AcQLookup: Array[Int] = Array(
      4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
      20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
      36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
      52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
      78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
      108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
      143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
      185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
      239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

    /** The three RFC 6386 appendix probability tables, carried as ONE
     *  swappable unit (the named conformance seam — see [[Vp8]]
     *  Scaladoc): default coefficient probabilities §13.5
     *  [plane][band][ctx][node], coefficient-probability update
     *  probabilities §13.4 (same shape), and key-frame B-mode
     *  probabilities §11.2 [above mode][left mode][node]. */
    final case class CoeffTables(
        defaultCoeffProbs: Array[Array[Array[Array[Int]]]],
        coeffUpdateProbs: Array[Array[Array[Array[Int]]]],
        kfBModeProbs: Array[Array[Array[Int]]])

    /** PLACEHOLDER table set (named conformance seam): deterministic
     *  structured values shared by encoder and decoder — every
     *  implemented behavior round-trips and oracle-certifies under
     *  them, but a third-party stream encoded under the real appendix
     *  data desyncs at the first coefficient token until
     *  [[loadCoeffTables]] swaps the data in. Values vary with every
     *  index so a transposed lookup cannot silently round-trip; the
     *  update-probability placeholder mirrors the appendix's
     *  overwhelmingly-255 shape. */
    val PlaceholderTables: CoeffTables = CoeffTables(
      Array.tabulate(4, 8, 3, 11) { (plane, band, ctx, node) =>
        1 + ((160 + 13 * plane + 7 * band + 29 * ctx + 17 * node) % 254)
      },
      Array.fill(4, 8, 3, 11)(255),
      Array.tabulate(10, 10, 9) { (a, l, n) =>
        1 + ((120 + 11 * a + 23 * l + 31 * n) % 254)
      })

    @volatile private var activeTables: CoeffTables = PlaceholderTables

    /** The live table set — every decode/encode use site reads through
     *  here, so the conformance swap is ONE data load, zero code. */
    def coeffTables: CoeffTables = activeTables

    /** Swap in an alternative table set (e.g. the RFC 6386 appendix
     *  data parsed from a resource file). Shape- and range-checked by
     *  NAME so a transposed or truncated data file fails at load, not
     *  as a silent desync. JVM-wide: on a cluster, call from a static
     *  initializer (jar resource) so every executor loads the same
     *  data before any task decodes. */
    def loadCoeffTables(t: CoeffTables): Unit = {
      def check4(a: Array[Array[Array[Array[Int]]]], what: String): Unit = {
        require(a.length == 4 && a.forall(_.length == 8) &&
          a.forall(_.forall(_.length == 3)) &&
          a.forall(_.forall(_.forall(_.length == 11))),
          s"$what must be [4][8][3][11]")
        require(a.forall(_.forall(_.forall(_.forall(v => v >= 1 && v <= 255)))),
          s"$what probabilities must be in [1, 255]")
      }
      check4(t.defaultCoeffProbs, "defaultCoeffProbs")
      check4(t.coeffUpdateProbs, "coeffUpdateProbs")
      require(t.kfBModeProbs.length == 10 &&
        t.kfBModeProbs.forall(_.length == 10) &&
        t.kfBModeProbs.forall(_.forall(_.length == 9)),
        "kfBModeProbs must be [10][10][9]")
      require(t.kfBModeProbs.forall(_.forall(_.forall(v => v >= 1 && v <= 255))),
        "kfBModeProbs probabilities must be in [1, 255]")
      activeTables = t
    }

    /** Restore the placeholder set (test hygiene). */
    def resetCoeffTables(): Unit = activeTables = PlaceholderTables

    // Use-site names read through the live set (volatile read + field
    // access — hot loops already hoist `val probs = DefaultCoeffProbs`).
    def DefaultCoeffProbs: Array[Array[Array[Array[Int]]]] =
      activeTables.defaultCoeffProbs
    def CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
      activeTables.coeffUpdateProbs
    def KfBModeProbs: Array[Array[Array[Int]]] =
      activeTables.kfBModeProbs
  }

  import Vp8Tables._

  // -------------------------------------------------------- bool coder

  /** §7.3 boolean decoder (range coder, 8-bit probabilities). */
  final class BoolDec(d: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private var pos = start
    value = (next() << 8) | next()

    private def next(): Int =
      if (pos < end) { val b = d(pos) & 0xFF; pos += 1; b } else 0

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var bit = 0
      if (value >= bigSplit) { range -= split; value -= bigSplit; bit = 1 }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      bit
    }

    /** Unsigned literal of `n` bits, MSB first, probability 128 each. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Magnitude literal with trailing sign bit (1 = negative). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    /** Walk a token tree (entries ≤ 0 are leaves, value = -token). */
    def tree(t: Array[Int], probs: Array[Int], startAt: Int = 0): Int = {
      var i = startAt
      while (true) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
      }
      0
    }
  }

  /** §7.2 boolean encoder (carry-propagating, 24-bit low window) —
   *  fixture grade: exists so specs and the oracle arm can round-trip
   *  the decoder. `toBytes` flushes and must be called once. */
  final class BoolEnc {
    private var lowValue: Long = 0L
    private var range = 255
    private var count = -24
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte](1 << 12)

    def bool(b: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (b != 0) { lowValue += split; range -= split } else range = split
      var shift = 0
      while ((range << shift) < 128) shift += 1
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count // in [1, 8]
        if (((lowValue << (offset - 1)) & 0x80000000L) != 0) {
          var x = buf.length - 1
          while (x >= 0 && buf(x) == 0xFF.toByte) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) = (buf(x) + 1).toByte
        }
        buf += ((lowValue >> (24 - offset)) & 0xFF).toByte
        lowValue = (lowValue << offset) & 0xFFFFFF
        shift = count
        count -= 8
      }
      lowValue = (lowValue << shift) & 0xFFFFFFFFL
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }

    def signedLiteral(v: Int, n: Int): Unit = {
      literal(math.abs(v), n)
      bool(if (v < 0) 1 else 0, 128)
    }

    /** Encode leaf `token` of tree `t` starting at node `startAt`. */
    def tree(t: Array[Int], probs: Array[Int], token: Int,
        startAt: Int = 0): Unit = {
      def dfs(i: Int): Option[List[(Int, Int)]] = {
        def branch(bit: Int): Option[List[(Int, Int)]] = {
          val nxt = t(i + bit)
          if (nxt == -token) Some((bit, i >> 1) :: Nil)
          else if (nxt > 0) dfs(nxt).map((bit, i >> 1) :: _)
          else None
        }
        branch(0).orElse(branch(1))
      }
      val path = dfs(startAt).getOrElse(
        throw new IllegalArgumentException(s"token $token not in tree"))
      path.foreach { case (b, pi) => bool(b, probs(pi)) }
    }

    def toBytes: Array[Byte] = {
      var i = 0
      while (i < 32) { bool(0, 128); i += 1 }
      buf.toArray
    }
  }

  // -------------------------------------------------- inverse transforms

  /** §14.3 exact integer inverse 4x4 DCT. Input raster-order
   *  dequantized coefficients; output residual (caller adds
   *  prediction). */
  def idct4x4(in: Array[Int]): Array[Int] = {
    val c1 = 20091 // (sqrt(2)*cos(pi/8) - 1) * 2^16 — the MINUS-ONE form:
    // the multiply sites compute x + ((x*c1) >> 16) = x*sqrt(2)cos(pi/8)
    val s1 = 35468 // sqrt(2)*sin(pi/8) * 2^15
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val ip0 = in(i); val ip4 = in(i + 4); val ip8 = in(i + 8)
      val ip12 = in(i + 12)
      val a1 = ip0 + ip8
      val b1 = ip0 - ip8
      val cc1 = ((ip4 * s1) >> 16) - (ip12 + ((ip12 * c1) >> 16))
      val d1 = (ip4 + ((ip4 * c1) >> 16)) + ((ip12 * s1) >> 16)
      tmp(i) = a1 + d1
      tmp(i + 12) = a1 - d1
      tmp(i + 4) = b1 + cc1
      tmp(i + 8) = b1 - cc1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val r = i * 4
      val ip0 = tmp(r); val ip1 = tmp(r + 1); val ip2 = tmp(r + 2)
      val ip3 = tmp(r + 3)
      val a1 = ip0 + ip2
      val b1 = ip0 - ip2
      val cc1 = ((ip1 * s1) >> 16) - (ip3 + ((ip3 * c1) >> 16))
      val d1 = (ip1 + ((ip1 * c1) >> 16)) + ((ip3 * s1) >> 16)
      out(r) = (a1 + d1 + 4) >> 3
      out(r + 3) = (a1 - d1 + 4) >> 3
      out(r + 1) = (b1 + cc1 + 4) >> 3
      out(r + 2) = (b1 - cc1 + 4) >> 3
      i += 1
    }
    out
  }

  /** §14.3 inverse Walsh–Hadamard transform for the Y2 block. */
  def iwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(i + 12)
      val b1 = in(i + 4) + in(i + 8)
      val c1 = in(i + 4) - in(i + 8)
      val d1 = in(i) - in(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val r = i * 4
      val a1 = tmp(r) + tmp(r + 3)
      val b1 = tmp(r + 1) + tmp(r + 2)
      val c1 = tmp(r + 1) - tmp(r + 2)
      val d1 = tmp(r) - tmp(r + 3)
      out(r) = (a1 + b1 + 3) >> 3
      out(r + 1) = (c1 + d1 + 3) >> 3
      out(r + 2) = (a1 - b1 + 3) >> 3
      out(r + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ----------------------------------------------------------- decoder

  private final case class Quant(y1dc: Int, y1ac: Int, y2dc: Int, y2ac: Int,
      uvdc: Int, uvac: Int)

  private def resolveQuant(baseQi: Int, y1dcD: Int, y2dcD: Int, y2acD: Int,
      uvdcD: Int, uvacD: Int): Quant = {
    def q(i: Int, t: Array[Int]): Int = t(math.max(0, math.min(127, i)))
    val y2ac0 = q(baseQi + y2acD, AcQLookup) * 155 / 100
    Quant(
      y1dc = q(baseQi + y1dcD, DcQLookup),
      y1ac = q(baseQi, AcQLookup),
      y2dc = q(baseQi + y2dcD, DcQLookup) * 2,
      y2ac = if (y2ac0 < 8) 8 else y2ac0,
      uvdc = math.min(132, q(baseQi + uvdcD, DcQLookup)),
      uvac = q(baseQi + uvacD, AcQLookup))
  }

  final case class Vp8Frame(width: Int, height: Int,
      y: Array[Int], u: Array[Int], v: Array[Int],
      yStride: Int, uvStride: Int)

  /** Decode one VP8 key frame (the payload of a WebP `VP8 ` chunk). */
  @volatile private var maxPixelsCap: Long = math.min(math.max(
    java.lang.Long.getLong("graft.vp8.maxPixels", 1L << 24), 1L << 16),
    1L << 28)

  /** Decode pixel budget: frames with more than this many pixels reject
   *  by name at decode (attacker bytes must not size executor-killing
   *  allocations — the decode footprint is ~24 B/px). Default 2^24
   *  (4096×4096); deployments ingesting large legitimate stills raise
   *  it via `-Dgraft.vp8.maxPixels=...` on every executor (or
   *  [[setMaxPixels]] from a static initializer), clamped to
   *  [2^16, 2^28] — the upper bound is VP8's own 14-bit dimension
   *  limit squared, where a decode costs ~6.4 GB and needs a
   *  correspondingly sized executor. */
  def maxPixels: Long = maxPixelsCap

  /** Set the decode pixel budget (JVM-wide; clamp-checked by name). */
  def setMaxPixels(px: Long): Unit = {
    require(px >= (1L << 16) && px <= (1L << 28),
      s"VP8 pixel budget $px outside [2^16, 2^28]")
    maxPixelsCap = px
  }

  def decodeFrame(p: Array[Byte]): Vp8Frame = {
    require(p.length >= 10, "truncated VP8 payload")
    val tag = (p(0) & 0xFF) | ((p(1) & 0xFF) << 8) | ((p(2) & 0xFF) << 16)
    require((tag & 1) == 0,
      "VP8 interframe — WebP stills are key frames only (named tier)")
    val firstPartSize = tag >> 5
    require((p(3) & 0xFF) == 0x9D && (p(4) & 0xFF) == 0x01 &&
      (p(5) & 0xFF) == 0x2A, "bad VP8 key-frame start code")
    val width = ((p(6) & 0xFF) | ((p(7) & 0xFF) << 8)) & 0x3FFF
    val height = ((p(8) & 0xFF) | ((p(9) & 0xFF) << 8)) & 0x3FFF
    require(width > 0 && height > 0, "bad VP8 dimensions")
    // Tighter than the other codecs' 2^26 by default: VP8 decode
    // carries three Int planes PLUS decodeToYuv's w·h·3 Float expansion
    // (~24 B/px), so the uniform cap still admitted ~1.3 GB per valid
    // payload (r13 advice). 2^24 px (4096×4096) bounds one decode at
    // ~400 MB under local[32] concurrency and covers typical crawl
    // images — but large legitimate stills exist (modern photos run
    // 12–108 MP), so the cap is CONFIGURABLE (r14 advice): see
    // [[Vp8.maxPixels]].
    require(width.toLong * height <= maxPixels,
      s"VP8 dimensions ${width}x$height exceed the decode pixel budget " +
        s"($maxPixels px — raise via Vp8.setMaxPixels / " +
        "-Dgraft.vp8.maxPixels for large-still deployments)")
    val mbCols = (width + 15) >> 4
    val mbRows = (height + 15) >> 4
    val headerEnd = 10 + firstPartSize
    require(headerEnd <= p.length, "truncated VP8 first partition")
    val bd = new BoolDec(p, 10, headerEnd)

    /* ---- frame header ---- */
    bd.literal(1) // color space
    bd.literal(1) // clamping type
    var segEnabled = false
    var segUpdateMap = false
    var segAbs = false
    val segTreeProbs = Array(255, 255, 255)
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    if (bd.bool(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.bool(128) == 1
      if (bd.bool(128) == 1) { // update feature data
        segAbs = bd.bool(128) == 1
        var i = 0
        while (i < 4) {
          if (bd.bool(128) == 1) segQuant(i) = bd.signedLiteral(7)
          i += 1
        }
        i = 0
        while (i < 4) { // per-segment loop-filter level (abs or delta)
          if (bd.bool(128) == 1) segLf(i) = bd.signedLiteral(6)
          i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bool(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refDeltas = new Array[Int](4) // [0] = INTRA_FRAME (all key-frame MBs)
    val modeDeltas = new Array[Int](4) // [0] = B_PRED
    if (bd.bool(128) == 1) { // lf delta enabled
      lfDeltaEnabled = true
      if (bd.bool(128) == 1) { // lf delta update
        var i = 0
        while (i < 8) {
          if (bd.bool(128) == 1) {
            val v = bd.signedLiteral(6)
            if (i < 4) refDeltas(i) = v else modeDeltas(i - 4) = v
          }
          i += 1
        }
      }
    }
    val nPartitions = 1 << bd.literal(2)
    val baseQi = bd.literal(7)
    def delta(): Int = if (bd.bool(128) == 1) bd.signedLiteral(4) else 0
    val y1dcD = delta(); val y2dcD = delta(); val y2acD = delta()
    val uvdcD = delta(); val uvacD = delta()
    bd.bool(128) // refresh entropy probs (irrelevant for a still)
    val coeffProbs = Array.tabulate(4, 8, 3, 11)((a, b, c, d) =>
      DefaultCoeffProbs(a)(b)(c)(d))
    var pl = 0
    while (pl < 4) {
      var band = 0
      while (band < 8) {
        var ctx = 0
        while (ctx < 3) {
          var n = 0
          while (n < 11) {
            if (bd.bool(CoeffUpdateProbs(pl)(band)(ctx)(n)) == 1)
              coeffProbs(pl)(band)(ctx)(n) = bd.literal(8)
            n += 1
          }
          ctx += 1
        }
        band += 1
      }
      pl += 1
    }
    val mbNoSkip = bd.bool(128) == 1
    val skipProb = if (mbNoSkip) bd.literal(8) else 0

    /* ---- per-MB mode info ---- */
    val nMbs = mbRows * mbCols
    val mbSegment = new Array[Int](nMbs)
    val mbSkip = new Array[Boolean](nMbs)
    val mbHasCoeffs = new Array[Boolean](nMbs) // §15.1 interior-edge gate
    val mbYMode = new Array[Int](nMbs)
    val mbUvMode = new Array[Int](nMbs)
    val mbBModes = new Array[Array[Int]](nMbs)
    val aboveB = Array.fill(mbCols * 4)(B_DC)
    var mby = 0
    while (mby < mbRows) {
      val leftB = Array.fill(4)(B_DC)
      var mbx = 0
      while (mbx < mbCols) {
        val mi = mby * mbCols + mbx
        if (segEnabled && segUpdateMap)
          mbSegment(mi) =
            if (bd.bool(segTreeProbs(0)) == 0) bd.bool(segTreeProbs(1))
            else 2 + bd.bool(segTreeProbs(2))
        if (mbNoSkip) mbSkip(mi) = bd.bool(skipProb) == 1
        val ym = bd.tree(KfYModeTree, KfYModeProbs)
        mbYMode(mi) = ym
        if (ym == B_PRED) {
          val bm = new Array[Int](16)
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val above = if (by == 0) aboveB(mbx * 4 + bx) else bm(sb - 4)
            val left = if (bx == 0) leftB(by) else bm(sb - 1)
            bm(sb) = bd.tree(BModeTree, KfBModeProbs(above)(left))
            sb += 1
          }
          mbBModes(mi) = bm
          var k = 0
          while (k < 4) {
            aboveB(mbx * 4 + k) = bm(12 + k); leftB(k) = bm(k * 4 + 3)
            k += 1
          }
        } else {
          val eff = ym match {
            case DC_PRED => B_DC
            case V_PRED => B_VE
            case H_PRED => B_HE
            case _ => B_TM
          }
          var k = 0
          while (k < 4) { aboveB(mbx * 4 + k) = eff; leftB(k) = eff; k += 1 }
        }
        mbUvMode(mi) = bd.tree(UvModeTree, KfUvModeProbs)
        mbx += 1
      }
      mby += 1
    }

    /* ---- token partitions ---- */
    val parts = new Array[BoolDec](nPartitions)
    if (nPartitions == 1) parts(0) = new BoolDec(p, headerEnd, p.length)
    else {
      var at = headerEnd + 3 * (nPartitions - 1)
      require(at <= p.length,
        s"truncated VP8 partition size table ($nPartitions partitions)")
      var i = 0
      while (i < nPartitions - 1) {
        val o = headerEnd + 3 * i
        val sz = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
          ((p(o + 2) & 0xFF) << 16)
        require(at.toLong + sz <= p.length,
          s"truncated VP8 token partition $i ($sz B at $at of ${p.length})")
        parts(i) = new BoolDec(p, at, at + sz)
        at += sz
        i += 1
      }
      parts(nPartitions - 1) = new BoolDec(p, at, p.length)
    }

    /* ---- token decode + reconstruction ---- */
    val yStride = mbCols * 16
    val uvStride = mbCols * 8
    val yPlane = new Array[Int](yStride * mbRows * 16)
    val uPlane = new Array[Int](uvStride * mbRows * 8)
    val vPlane = new Array[Int](uvStride * mbRows * 8)

    val aboveY = new Array[Boolean](mbCols * 4)
    val aboveU = new Array[Boolean](mbCols * 2)
    val aboveV = new Array[Boolean](mbCols * 2)
    val aboveY2 = new Array[Boolean](mbCols)

    val quants = Array.tabulate(4) { s =>
      val qi =
        if (!segEnabled) baseQi
        else if (segAbs) segQuant(s)
        else baseQi + segQuant(s)
      resolveQuant(qi, y1dcD, y2dcD, y2acD, uvdcD, uvacD)
    }

    mby = 0
    while (mby < mbRows) {
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      val td = parts(mby % nPartitions)
      var mbx = 0
      while (mbx < mbCols) {
        val mi = mby * mbCols + mbx
        val q = quants(mbSegment(mi))
        val hasY2 = mbYMode(mi) != B_PRED
        val coeffs = new Array[Array[Int]](25)

        if (mbSkip(mi)) {
          var k = 0
          while (k < 4) { aboveY(mbx * 4 + k) = false; leftY(k) = false; k += 1 }
          k = 0
          while (k < 2) {
            aboveU(mbx * 2 + k) = false; leftU(k) = false
            aboveV(mbx * 2 + k) = false; leftV(k) = false
            k += 1
          }
          if (hasY2) { aboveY2(mbx) = false; leftY2 = false }
        } else {
          def block(plane: Int, first: Int, dcq: Int, acq: Int,
              ctx0: Int): (Array[Int], Boolean) = {
            val out = new Array[Int](16)
            var any = false
            var c = first
            var ctx = ctx0
            var skipEob = false
            var done = false
            while (!done && c < 16) {
              val probs = coeffProbs(plane)(CoeffBands(c))(ctx)
              val tok = td.tree(CoeffTree, probs, if (skipEob) 2 else 0)
              if (tok == EOB) done = true
              else if (tok == DCT_0) { ctx = 0; skipEob = true; c += 1 }
              else {
                val base = tok match {
                  case DCT_1 => 1
                  case DCT_2 => 2
                  case DCT_3 => 3
                  case DCT_4 => 4
                  case cat =>
                    val ci = cat - CAT1
                    val cp = CatProbs(ci)
                    var extra = 0
                    var b = 0
                    while (b < cp.length) {
                      extra = (extra << 1) | td.bool(cp(b)); b += 1
                    }
                    CatBases(ci) + extra
                }
                val v = if (td.bool(128) == 1) -base else base
                out(Zigzag(c)) = v * (if (c == 0) dcq else acq)
                any = true
                ctx = if (base > 1) 2 else 1
                skipEob = false
                c += 1
              }
            }
            (out, any)
          }

          if (hasY2) {
            val ctx = (if (aboveY2(mbx)) 1 else 0) + (if (leftY2) 1 else 0)
            val (c2, nz2) = block(1, 0, q.y2dc, q.y2ac, ctx)
            coeffs(24) = c2
            aboveY2(mbx) = nz2; leftY2 = nz2
            if (nz2) mbHasCoeffs(mi) = true
          }
          val yPlaneType = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(mbx * 4 + bx)) 1 else 0) +
              (if (leftY(by)) 1 else 0)
            val (cb, nz) = block(yPlaneType, yFirst, q.y1dc, q.y1ac, ctx)
            coeffs(sb) = cb
            aboveY(mbx * 4 + bx) = nz; leftY(by) = nz
            if (nz) mbHasCoeffs(mi) = true
            sb += 1
          }
          var ub = 0
          while (ub < 4) {
            val bx = ub & 1; val by = ub >> 1
            val ctx = (if (aboveU(mbx * 2 + bx)) 1 else 0) +
              (if (leftU(by)) 1 else 0)
            val (cb, nz) = block(2, 0, q.uvdc, q.uvac, ctx)
            coeffs(16 + ub) = cb
            aboveU(mbx * 2 + bx) = nz; leftU(by) = nz
            if (nz) mbHasCoeffs(mi) = true
            ub += 1
          }
          var vb = 0
          while (vb < 4) {
            val bx = vb & 1; val by = vb >> 1
            val ctx = (if (aboveV(mbx * 2 + bx)) 1 else 0) +
              (if (leftV(by)) 1 else 0)
            val (cb, nz) = block(2, 0, q.uvdc, q.uvac, ctx)
            coeffs(20 + vb) = cb
            aboveV(mbx * 2 + bx) = nz; leftV(by) = nz
            if (nz) mbHasCoeffs(mi) = true
            vb += 1
          }
        }

        reconstructMb(mbx, mby, mbCols, mbYMode(mi), mbUvMode(mi),
          mbBModes(mi), hasY2, coeffs, yPlane, yStride, uPlane, vPlane,
          uvStride)
        mbx += 1
      }
      mby += 1
    }
    // §15: in-loop deblocking as a frame post-pass (intra prediction
    // above used the unfiltered neighbors, per spec). libvpx skips the
    // whole pass when the frame-header level is 0, even under
    // absolute-mode segment levels — mirrored here.
    if (filterLevel > 0)
      loopFilterFrame(yPlane, yStride, uPlane, vPlane, uvStride,
        mbRows, mbCols, simpleFilter, filterLevel, sharpness,
        segEnabled, segAbs, segLf, lfDeltaEnabled,
        refDeltas(0), modeDeltas(0), mbSegment, mbYMode, mbHasCoeffs)
    Vp8Frame(width, height, yPlane, uPlane, vPlane, yStride, uvStride)
  }

  // ----------------------------------------------- intra reconstruction

  private def reconstructMb(mbx: Int, mby: Int, mbCols: Int,
      yMode: Int, uvMode: Int, bModes: Array[Int], hasY2: Boolean,
      coeffs: Array[Array[Int]],
      yP: Array[Int], yS: Int, uP: Array[Int], vP: Array[Int],
      uvS: Int): Unit = {
    val x0 = mbx * 16; val y0 = mby * 16

    val dcs = new Array[Int](16)
    if (hasY2 && coeffs(24) != null) {
      val w = iwht4x4(coeffs(24))
      System.arraycopy(w, 0, dcs, 0, 16)
    }

    @inline def residual(idx: Int, dc: Int): Array[Int] = {
      val c = coeffs(idx)
      if (c == null) {
        if (dc == 0) null
        else { val only = new Array[Int](16); only(0) = dc; idct4x4(only) }
      } else {
        if (hasY2 && idx < 16) c(0) = dc
        idct4x4(c)
      }
    }

    if (yMode == B_PRED) {
      var sb = 0
      while (sb < 16) {
        val bx = x0 + (sb & 3) * 4; val by = y0 + (sb >> 2) * 4
        val pred = predict4x4(bModes(sb), yP, yS, bx, by, sb, mbCols)
        blit4(yP, yS, bx, by, pred, 4, 0, 0, residual(sb, 0))
        sb += 1
      }
    } else {
      val pred = predictBlock(yMode, yP, yS, x0, y0, 16)
      var sb = 0
      while (sb < 16) {
        val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
        blit4(yP, yS, x0 + bx, y0 + by, pred, 16, bx, by,
          residual(sb, if (hasY2) dcs(sb) else 0))
        sb += 1
      }
    }
    val ux0 = mbx * 8; val uy0 = mby * 8
    val uPred = predictBlock(uvMode, uP, uvS, ux0, uy0, 8)
    val vPred = predictBlock(uvMode, vP, uvS, ux0, uy0, 8)
    var cb = 0
    while (cb < 4) {
      val bx = (cb & 1) * 4; val by = (cb >> 1) * 4
      blit4(uP, uvS, ux0 + bx, uy0 + by, uPred, 8, bx, by,
        residual(16 + cb, 0))
      blit4(vP, uvS, ux0 + bx, uy0 + by, vPred, 8, bx, by,
        residual(20 + cb, 0))
      cb += 1
    }
  }

  // ------------------------------------------------- loop filter (§15)
  //
  // RFC 6386 §15.2 (simple) and §15.3 (normal) edge filters — normative
  // BODY text, not appendix data, so fully implementable offline (the
  // r13 verdict's "implementable codec step"). Pixels cross an edge as
  //   P3 P2 P1 P0 | Q0 Q1 Q2 Q3
  // where `i` indexes Q0 and `pitch` is 1 for a vertical edge (walk a
  // row) or the plane stride for a horizontal edge (walk a column).
  // Arithmetic mirrors the spec's int8 model exactly: u2s = v - 128,
  // c() clamps to [-128, 127], s2u is the (uint8_t)(v + 128) CAST —
  // wrapping, not clamping, like the reference code.

  @inline private def c8(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v
  @inline private def s2u(v: Int): Int = (v + 128) & 0xFF

  /** §15.2 common adjustment on P1 P0 | Q0 Q1; returns F. */
  private[graft] def commonAdjust(p: Array[Int], i: Int, pitch: Int,
      useOuterTaps: Boolean): Int = {
    val pp1 = p(i - 2 * pitch) - 128
    val pp0 = p(i - pitch) - 128
    val qq0 = p(i) - 128
    val qq1 = p(i + pitch) - 128
    val a = c8((if (useOuterTaps) c8(pp1 - qq1) else 0) + 3 * (qq0 - pp0))
    val f = c8(a + 4) >> 3
    val e = c8(a + 3) >> 3
    p(i) = s2u(qq0 - f)
    p(i - pitch) = s2u(pp0 + e)
    f
  }

  /** §15.2 simple-filter segment (luma only). */
  private[graft] def simpleSegment(p: Array[Int], i: Int, pitch: Int,
      edgeLimit: Int): Unit = {
    if (math.abs(p(i - pitch) - p(i)) * 2 +
        math.abs(p(i - 2 * pitch) - p(i + pitch)) / 2 <= edgeLimit)
      commonAdjust(p, i, pitch, useOuterTaps = true)
  }

  /** §15.3 filter-applies mask over the 8-pixel segment. */
  private def filterYes(p: Array[Int], i: Int, pitch: Int,
      interior: Int, edge: Int): Boolean = {
    @inline def px(k: Int): Int = p(i + k * pitch)
    math.abs(px(-1) - px(0)) * 2 + math.abs(px(-2) - px(1)) / 2 <= edge &&
      math.abs(px(-4) - px(-3)) <= interior &&
      math.abs(px(-3) - px(-2)) <= interior &&
      math.abs(px(-2) - px(-1)) <= interior &&
      math.abs(px(3) - px(2)) <= interior &&
      math.abs(px(2) - px(1)) <= interior &&
      math.abs(px(1) - px(0)) <= interior
  }

  /** §15.3 high-edge-variance test. */
  private def hev(p: Array[Int], i: Int, pitch: Int, thresh: Int): Boolean =
    math.abs(p(i - 2 * pitch) - p(i - pitch)) > thresh ||
      math.abs(p(i + pitch) - p(i)) > thresh

  /** §15.3 sub-block (interior) edge filter. */
  private[graft] def subblockFilter(p: Array[Int], i: Int, pitch: Int,
      hevThresh: Int, interior: Int, edge: Int): Unit = {
    if (filterYes(p, i, pitch, interior, edge)) {
      val hv = hev(p, i, pitch, hevThresh)
      val a = (commonAdjust(p, i, pitch, hv) + 1) >> 1
      if (!hv) {
        p(i + pitch) = s2u((p(i + pitch) - 128) - a)
        p(i - 2 * pitch) = s2u((p(i - 2 * pitch) - 128) + a)
      }
    }
  }

  /** §15.3 macroblock edge filter (the wide 27/18/9 taps). */
  private[graft] def mbEdgeFilter(p: Array[Int], i: Int, pitch: Int,
      hevThresh: Int, interior: Int, edge: Int): Unit = {
    if (filterYes(p, i, pitch, interior, edge)) {
      if (!hev(p, i, pitch, hevThresh)) {
        val p2 = p(i - 3 * pitch) - 128
        val p1 = p(i - 2 * pitch) - 128
        val p0 = p(i - pitch) - 128
        val q0 = p(i) - 128
        val q1 = p(i + pitch) - 128
        val q2 = p(i + 2 * pitch) - 128
        val w = c8(c8(p1 - q1) + 3 * (q0 - p0))
        var a = c8((27 * w + 63) >> 7)
        p(i) = s2u(q0 - a); p(i - pitch) = s2u(p0 + a)
        a = c8((18 * w + 63) >> 7)
        p(i + pitch) = s2u(q1 - a); p(i - 2 * pitch) = s2u(p1 + a)
        a = c8((9 * w + 63) >> 7)
        p(i + 2 * pitch) = s2u(q2 - a); p(i - 3 * pitch) = s2u(p2 + a)
      } else commonAdjust(p, i, pitch, useOuterTaps = true)
    }
  }

  /** §15.1 per-MB loop-filter level: segment base (abs or delta,
   *  clamped), then the key-frame INTRA ref delta plus the B_PRED mode
   *  delta, clamped again. Pure — exposed for spec coverage of the
   *  branches the DC-grid fixture can't reach (segment levels, the
   *  B_PRED mode delta). */
  private[graft] def mbFilterLevel(frameLevel: Int, segEnabled: Boolean,
      segAbs: Boolean, segLfValue: Int, lfDeltaEnabled: Boolean,
      refDeltaIntra: Int, modeDeltaBPred: Int, isBPred: Boolean): Int = {
    var lvl =
      if (!segEnabled) frameLevel
      else if (segAbs) segLfValue
      else frameLevel + segLfValue
    if (lvl < 0) lvl = 0 else if (lvl > 63) lvl = 63
    if (lfDeltaEnabled) {
      lvl += refDeltaIntra
      if (isBPred) lvl += modeDeltaBPred
      if (lvl < 0) lvl = 0 else if (lvl > 63) lvl = 63
    }
    lvl
  }

  /** §15 whole-frame pass, MBs in raster order, per MB: vertical MB
   *  edge, interior vertical edges, horizontal MB edge, interior
   *  horizontal edges (the spec's order). Runs AFTER full-frame
   *  reconstruction — VP8 intra prediction reads the UNFILTERED
   *  neighbors, so filtering is a frame post-pass, not per-MB.
   *  Interior edges filter only when the MB carried any non-zero
   *  coefficient or is B_PRED (§15.1); the simple filter touches luma
   *  only. */
  private def loopFilterFrame(
      yP: Array[Int], yS: Int, uP: Array[Int], vP: Array[Int], uvS: Int,
      mbRows: Int, mbCols: Int,
      simple: Boolean, frameLevel: Int, sharpness: Int,
      segEnabled: Boolean, segAbs: Boolean, segLf: Array[Int],
      lfDeltaEnabled: Boolean, refDeltaIntra: Int, modeDeltaBPred: Int,
      mbSegment: Array[Int], mbYMode: Array[Int],
      mbHasCoeffs: Array[Boolean]): Unit = {
    var mby = 0
    while (mby < mbRows) {
      var mbx = 0
      while (mbx < mbCols) {
        val mi = mby * mbCols + mbx
        val lvl = mbFilterLevel(frameLevel, segEnabled, segAbs,
          segLf(mbSegment(mi)), lfDeltaEnabled, refDeltaIntra,
          modeDeltaBPred, mbYMode(mi) == B_PRED)
        if (lvl > 0) {
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbE = (lvl + 2) * 2 + interior
          val sbE = lvl * 2 + interior
          val inner = mbHasCoeffs(mi) || mbYMode(mi) == B_PRED
          val x0 = mbx * 16; val y0 = mby * 16
          val cx0 = mbx * 8; val cy0 = mby * 8
          if (simple) {
            if (mbx > 0) {
              var r = 0
              while (r < 16) {
                simpleSegment(yP, (y0 + r) * yS + x0, 1, mbE); r += 1
              }
            }
            if (inner) {
              var b = 4
              while (b < 16) {
                var r = 0
                while (r < 16) {
                  simpleSegment(yP, (y0 + r) * yS + x0 + b, 1, sbE); r += 1
                }
                b += 4
              }
            }
            if (mby > 0) {
              var cc = 0
              while (cc < 16) {
                simpleSegment(yP, y0 * yS + x0 + cc, yS, mbE); cc += 1
              }
            }
            if (inner) {
              var b = 4
              while (b < 16) {
                var cc = 0
                while (cc < 16) {
                  simpleSegment(yP, (y0 + b) * yS + x0 + cc, yS, sbE)
                  cc += 1
                }
                b += 4
              }
            }
          } else {
            if (mbx > 0) {
              var r = 0
              while (r < 16) {
                mbEdgeFilter(yP, (y0 + r) * yS + x0, 1, hevT, interior, mbE)
                r += 1
              }
              r = 0
              while (r < 8) {
                val ci = (cy0 + r) * uvS + cx0
                mbEdgeFilter(uP, ci, 1, hevT, interior, mbE)
                mbEdgeFilter(vP, ci, 1, hevT, interior, mbE)
                r += 1
              }
            }
            if (inner) {
              var b = 4
              while (b < 16) {
                var r = 0
                while (r < 16) {
                  subblockFilter(yP, (y0 + r) * yS + x0 + b, 1,
                    hevT, interior, sbE)
                  r += 1
                }
                b += 4
              }
              var r = 0
              while (r < 8) {
                val ci = (cy0 + r) * uvS + cx0 + 4
                subblockFilter(uP, ci, 1, hevT, interior, sbE)
                subblockFilter(vP, ci, 1, hevT, interior, sbE)
                r += 1
              }
            }
            if (mby > 0) {
              var cc = 0
              while (cc < 16) {
                mbEdgeFilter(yP, y0 * yS + x0 + cc, yS, hevT, interior, mbE)
                cc += 1
              }
              cc = 0
              while (cc < 8) {
                val ci = cy0 * uvS + cx0 + cc
                mbEdgeFilter(uP, ci, uvS, hevT, interior, mbE)
                mbEdgeFilter(vP, ci, uvS, hevT, interior, mbE)
                cc += 1
              }
            }
            if (inner) {
              var b = 4
              while (b < 16) {
                var cc = 0
                while (cc < 16) {
                  subblockFilter(yP, (y0 + b) * yS + x0 + cc, yS,
                    hevT, interior, sbE)
                  cc += 1
                }
                b += 4
              }
              var cc = 0
              while (cc < 8) {
                val ci = (cy0 + 4) * uvS + cx0 + cc
                subblockFilter(uP, ci, uvS, hevT, interior, sbE)
                subblockFilter(vP, ci, uvS, hevT, interior, sbE)
                cc += 1
              }
            }
          }
        }
        mbx += 1
      }
      mby += 1
    }
  }

  /** Whole-block (16×16 luma / 8×8 chroma) prediction with §12.2
   *  frame-edge defaults: above = 127, left = 129, above-left follows
   *  the above row (127) when the above row is synthetic, else the
   *  left column (129) when only the left is synthetic. */
  private[graft] def predictBlock(mode: Int, plane: Array[Int], stride: Int,
      x0: Int, y0: Int, n: Int): Array[Int] = {
    val hasAbove = y0 > 0
    val hasLeft = x0 > 0
    @inline def above(c: Int): Int =
      if (hasAbove) plane((y0 - 1) * stride + x0 + c) else 127
    @inline def left(r: Int): Int =
      if (hasLeft) plane((y0 + r) * stride + x0 - 1) else 129
    val aboveLeft =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else plane((y0 - 1) * stride + x0 - 1)
    val out = new Array[Int](n * n)
    mode match {
      case DC_PRED =>
        val lg = if (n == 16) 4 else 3 // log2(2n)
        var dc = 128
        var sum = 0
        if (hasAbove && hasLeft) {
          var i = 0
          while (i < n) { sum += above(i) + left(i); i += 1 }
          dc = (sum + (1 << lg)) >> (lg + 1)
        } else if (hasAbove) {
          var i = 0
          while (i < n) { sum += above(i); i += 1 }
          dc = (sum + (1 << (lg - 1))) >> lg
        } else if (hasLeft) {
          var i = 0
          while (i < n) { sum += left(i); i += 1 }
          dc = (sum + (1 << (lg - 1))) >> lg
        }
        java.util.Arrays.fill(out, dc)
      case V_PRED =>
        var r = 0
        while (r < n) {
          var c = 0
          while (c < n) { out(r * n + c) = above(c); c += 1 }
          r += 1
        }
      case H_PRED =>
        var r = 0
        while (r < n) {
          java.util.Arrays.fill(out, r * n, r * n + n, left(r))
          r += 1
        }
      case TM_PRED =>
        var r = 0
        while (r < n) {
          var c = 0
          while (c < n) {
            out(r * n + c) = clamp255(left(r) + above(c) - aboveLeft)
            c += 1
          }
          r += 1
        }
      case other =>
        throw new IllegalArgumentException(s"bad whole-block mode $other")
    }
    out
  }

  /** 4×4 B_PRED sub-block prediction (§12.3). Edge pixels: pp = the
   *  9-pixel boundary [L3 L2 L1 L0 P A0 A1 A2] (indices 0..7, P at 4),
   *  A = above row with above-right A(4..7). Above-right follows the
   *  common decoder behavior: for the MB's rightmost sub-block column
   *  it reads the row above the MACROBLOCK; off the frame's right edge
   *  it replicates A(3); synthetic rows are 127. */
  private[graft] def predict4x4(mode: Int, plane: Array[Int], stride: Int,
      x0: Int, y0: Int, sb: Int, mbCols: Int): Array[Int] = {
    val hasAbove = y0 > 0
    val hasLeft = x0 > 0
    val frameRight = mbCols * 16
    @inline def px(x: Int, y: Int): Int = plane(y * stride + x)
    val A = new Array[Int](8)
    var i = 0
    while (i < 4) { A(i) = if (hasAbove) px(x0 + i, y0 - 1) else 127; i += 1 }
    // above-right source row: sub-block row for interior columns, the
    // MB-above row for the rightmost column (the VP8 quirk)
    val bx = sb & 3
    val arY = if (bx < 3) y0 - 1 else (y0 - (sb >> 2) * 4) - 1
    i = 4
    while (i < 8) {
      val x = x0 + i
      A(i) =
        if (arY < 0) 127
        else if (x >= frameRight) A(3)
        else px(x, arY)
      i += 1
    }
    val L = new Array[Int](4)
    i = 0
    while (i < 4) { L(i) = if (hasLeft) px(x0 - 1, y0 + i) else 129; i += 1 }
    val P =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else px(x0 - 1, y0 - 1)
    // pp = [L3, L2, L1, L0, P, A0, A1, A2]
    val pp = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2))
    val out = new Array[Int](16)
    @inline def avg2(a: Int, b: Int) = (a + b + 1) >> 1
    @inline def avg3(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2
    @inline def set(r: Int, c: Int, v: Int): Unit = out(r * 4 + c) = v
    mode match {
      case B_DC =>
        var s = 4
        var k = 0
        while (k < 4) { s += A(k) + L(k); k += 1 }
        java.util.Arrays.fill(out, s >> 3)
      case B_TM =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, clamp255(L(r) + A(c) - P)); c += 1 }
          r += 1
        }
      case B_VE =>
        val t = Array(avg3(P, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
        var r = 0
        while (r < 4) { System.arraycopy(t, 0, out, r * 4, 4); r += 1 }
      case B_HE =>
        val t = Array(avg3(P, L(0), L(1)), avg3(L(0), L(1), L(2)),
          avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
        var r = 0
        while (r < 4) {
          java.util.Arrays.fill(out, r * 4, r * 4 + 4, t(r)); r += 1
        }
      case B_LD =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = r + c
            set(r, c,
              if (k < 6) avg3(A(k), A(k + 1), A(k + 2))
              else avg3(A(6), A(7), A(7)))
            c += 1
          }
          r += 1
        }
      case B_RD =>
        val e = Array(
          avg3(L(3), L(2), L(1)), avg3(L(2), L(1), L(0)),
          avg3(L(1), L(0), P), avg3(L(0), P, A(0)),
          avg3(P, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, e(3 + c - r)); c += 1 }
          r += 1
        }
      case B_VR =>
        set(0, 0, avg2(pp(4), pp(5))); set(0, 1, avg2(pp(5), pp(6)))
        set(0, 2, avg2(pp(6), pp(7))); set(0, 3, avg2(pp(7), A(3)))
        set(1, 0, avg3(pp(3), pp(4), pp(5)))
        set(1, 1, avg3(pp(4), pp(5), pp(6)))
        set(1, 2, avg3(pp(5), pp(6), pp(7)))
        set(1, 3, avg3(pp(6), pp(7), A(3)))
        set(2, 0, avg3(pp(2), pp(3), pp(4)))
        set(2, 1, out(0)); set(2, 2, out(1)); set(2, 3, out(2))
        set(3, 0, avg3(pp(1), pp(2), pp(3)))
        set(3, 1, out(4)); set(3, 2, out(5)); set(3, 3, out(6))
      case B_VL =>
        set(0, 0, avg2(A(0), A(1))); set(0, 1, avg2(A(1), A(2)))
        set(0, 2, avg2(A(2), A(3))); set(0, 3, avg2(A(3), A(4)))
        set(1, 0, avg3(A(0), A(1), A(2)))
        set(1, 1, avg3(A(1), A(2), A(3)))
        set(1, 2, avg3(A(2), A(3), A(4)))
        set(1, 3, avg3(A(3), A(4), A(5)))
        set(2, 0, out(1)); set(2, 1, out(2)); set(2, 2, out(3))
        set(2, 3, avg3(A(4), A(5), A(6)))
        set(3, 0, out(5)); set(3, 1, out(6)); set(3, 2, out(7))
        set(3, 3, avg3(A(5), A(6), A(7)))
      case B_HD =>
        set(0, 0, avg2(pp(3), pp(4)))
        set(0, 1, avg3(pp(3), pp(4), pp(5)))
        set(0, 2, avg3(pp(4), pp(5), pp(6)))
        set(0, 3, avg3(pp(5), pp(6), pp(7)))
        set(1, 0, avg2(pp(2), pp(3)))
        set(1, 1, avg3(pp(2), pp(3), pp(4)))
        set(1, 2, out(0)); set(1, 3, out(1))
        set(2, 0, avg2(pp(1), pp(2)))
        set(2, 1, avg3(pp(1), pp(2), pp(3)))
        set(2, 2, out(4)); set(2, 3, out(5))
        set(3, 0, avg2(pp(0), pp(1)))
        set(3, 1, avg3(pp(0), pp(1), pp(2)))
        set(3, 2, out(8)); set(3, 3, out(9))
      case B_HU =>
        set(0, 0, avg2(L(0), L(1))); set(0, 1, avg3(L(0), L(1), L(2)))
        set(0, 2, avg2(L(1), L(2))); set(0, 3, avg3(L(1), L(2), L(3)))
        set(1, 0, out(2)); set(1, 1, out(3))
        set(1, 2, avg2(L(2), L(3))); set(1, 3, avg3(L(2), L(3), L(3)))
        set(2, 0, out(6)); set(2, 1, out(7))
        set(2, 2, L(3)); set(2, 3, L(3))
        set(3, 0, L(3)); set(3, 1, L(3)); set(3, 2, L(3)); set(3, 3, L(3))
      case other =>
        throw new IllegalArgumentException(s"bad 4x4 mode $other")
    }
    out
  }

  /** Write a 4×4 region: prediction (an n×n block sampled at offset
   *  (px, py)) + residual (nullable), clamped into the plane. */
  @inline private def blit4(plane: Array[Int], stride: Int, x0: Int,
      y0: Int, pred: Array[Int], n: Int, px: Int, py: Int,
      res: Array[Int]): Unit = {
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        val v = pred((py + r) * n + px + c) +
          (if (res == null) 0 else res(r * 4 + c))
        plane((y0 + r) * stride + x0 + c) = clamp255(v)
        c += 1
      }
      r += 1
    }
  }

  // ----------------------------------------------------------- encoder

  /** Fixture-grade VP8 key-frame encoder: every MB 16×16 DC intra;
   *  MB (0,0) carries DC-only Y2 and chroma coefficients, every other
   *  MB is skip-coded, so DC prediction propagates the constant frame.
   *  Exists to round-trip the decoder and drive the oracle arm; shares
   *  every table with it. */
  def encodeSolid(width: Int, height: Int, wY: Int, wU: Int, wV: Int,
      qIndex: Int = 0): Array[Byte] = {
    require(width >= 1 && width <= 16383 && height >= 1 && height <= 16383)
    require(qIndex >= 0 && qIndex <= 127)
    val mbCols = (width + 15) >> 4
    val mbRows = (height + 15) >> 4
    val bd = new BoolEnc
    bd.literal(0, 1) // color space
    bd.literal(0, 1) // clamping
    bd.bool(0, 128) // segmentation off
    bd.literal(0, 1) // filter type
    bd.literal(0, 6) // loop filter level 0
    bd.literal(0, 3) // sharpness
    bd.bool(0, 128) // lf adj off
    bd.literal(0, 2) // 1 token partition
    bd.literal(qIndex, 7)
    var i = 0
    while (i < 5) { bd.bool(0, 128); i += 1 } // no quant deltas
    bd.bool(0, 128) // refresh entropy probs
    var pl = 0
    while (pl < 4) { // no coeff prob updates
      var band = 0
      while (band < 8) {
        var ctx = 0
        while (ctx < 3) {
          var n = 0
          while (n < 11) {
            bd.bool(0, CoeffUpdateProbs(pl)(band)(ctx)(n)); n += 1
          }
          ctx += 1
        }
        band += 1
      }
      pl += 1
    }
    bd.bool(1, 128) // mb_no_skip_coeff on
    val skipProb = 128
    bd.literal(skipProb, 8)
    var mb = 0
    while (mb < mbRows * mbCols) {
      bd.bool(if (mb == 0) 0 else 1, skipProb)
      bd.tree(KfYModeTree, KfYModeProbs, DC_PRED)
      bd.tree(UvModeTree, KfUvModeProbs, DC_PRED)
      mb += 1
    }
    val part1 = bd.toBytes

    val te = new BoolEnc
    val probs = DefaultCoeffProbs
    def dcBlock(plane: Int, w: Int, ctx0: Int): Unit = {
      if (w == 0) {
        te.tree(CoeffTree, probs(plane)(CoeffBands(0))(ctx0), EOB)
        return
      }
      val mag = math.abs(w)
      var ci = 0
      val tok =
        if (mag <= 4) mag
        else {
          while (ci < 5 && mag >= CatBases(ci + 1)) ci += 1
          CAT1 + ci
        }
      te.tree(CoeffTree, probs(plane)(CoeffBands(0))(ctx0), tok)
      if (tok >= CAT1) {
        val cp = CatProbs(ci)
        val extra = mag - CatBases(ci)
        var k = 0
        while (k < cp.length) {
          te.bool((extra >> (cp.length - 1 - k)) & 1, cp(k)); k += 1
        }
      }
      te.bool(if (w < 0) 1 else 0, 128) // sign
      val nctx = if (mag > 1) 2 else 1
      te.tree(CoeffTree, probs(plane)(CoeffBands(1))(nctx), EOB)
    }
    dcBlock(1, wY, 0) // Y2
    var sb = 0
    while (sb < 16) { // 16 empty Y blocks (first coeff 1, ctx stays 0)
      te.tree(CoeffTree, probs(0)(CoeffBands(1))(0), EOB)
      sb += 1
    }
    def chroma(w: Int): Unit = {
      val c12 = if (w != 0) 1 else 0
      val c3 = if (w != 0) 2 else 0
      dcBlock(2, w, 0); dcBlock(2, w, c12); dcBlock(2, w, c12)
      dcBlock(2, w, c3)
    }
    chroma(wU); chroma(wV)
    val part2 = te.toBytes
    packKeyFrame(width, height, part1, part2)
  }

  /** Uncompressed key-frame tag + start code + dims around the two
   *  encoded partitions (shared by the fixture encoders). */
  private def packKeyFrame(width: Int, height: Int, part1: Array[Byte],
      part2: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      part1.length + part2.length + 16)
    val tag = (part1.length << 5) | (1 << 4) // show_frame=1, keyframe=0
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
    out.write((tag >> 16) & 0xFF)
    out.write(0x9D); out.write(0x01); out.write(0x2A)
    out.write(width & 0xFF); out.write((width >> 8) & 0x3F)
    out.write(height & 0xFF); out.write((height >> 8) & 0x3F)
    out.write(part1, 0, part1.length)
    out.write(part2, 0, part2.length)
    out.toByteArray
  }

  /** Write one DC-only coefficient block (token + category extra bits +
   *  sign + trailing EOB) at entry context `ctx0`; returns whether the
   *  block was non-empty (the neighbor-context bit). */
  private def writeDcToken(te: BoolEnc, plane: Int, w: Int,
      ctx0: Int): Boolean = {
    val probs = DefaultCoeffProbs
    if (w == 0) {
      te.tree(CoeffTree, probs(plane)(CoeffBands(0))(ctx0), EOB)
      return false
    }
    val mag = math.abs(w)
    var ci = 0
    val tok =
      if (mag <= 4) mag
      else {
        while (ci < 5 && mag >= CatBases(ci + 1)) ci += 1
        CAT1 + ci
      }
    te.tree(CoeffTree, probs(plane)(CoeffBands(0))(ctx0), tok)
    if (tok >= CAT1) {
      val cp = CatProbs(ci)
      val extra = mag - CatBases(ci)
      var k = 0
      while (k < cp.length) {
        te.bool((extra >> (cp.length - 1 - k)) & 1, cp(k)); k += 1
      }
    }
    te.bool(if (w < 0) 1 else 0, 128) // sign
    val nctx = if (mag > 1) 2 else 1
    te.tree(CoeffTree, probs(plane)(CoeffBands(1))(nctx), EOB)
    true
  }

  /** Fixture: a grid of DC-only 16×16-intra macroblocks — MB `mi`
   *  carries Y2 DC level `yLv(mi)` and chroma DC levels
   *  `uLv(mi)`/`vLv(mi)` (deltas against DC_PRED propagation from
   *  left/above), with the loop-filter header fields under test
   *  (`filterType` 0 = normal / 1 = simple, level, sharpness). Every
   *  MB codes tokens (no skip), so interior edges are filter-eligible.
   *  Exists to certify the §15 loop filter on step edges whose
   *  filtered pixels are hand-computed in Vp8Spec. */
  /** With `segLfAbs` non-null, the frame enables SEGMENTATION in
   *  absolute mode: per-segment quantizer = `qIndex` (so pixel math is
   *  unchanged), per-segment loop-filter level = `segLfAbs(s)`, segment
   *  map coded per MB from `segIds` through real tree probs (128) —
   *  fixture coverage for the seg-parse branches no other encoder
   *  reaches. */
  def encodeDcGrid(width: Int, height: Int, yLv: Array[Int],
      uLv: Array[Int], vLv: Array[Int], qIndex: Int,
      filterType: Int, filterLevel: Int, sharpness: Int,
      refDeltaIntra: Int = 0, modeDeltaBPred: Int = 0,
      segLfAbs: Array[Int] = null, segIds: Array[Int] = null): Array[Byte] = {
    require(width >= 1 && width <= 16383 && height >= 1 && height <= 16383)
    require(qIndex >= 0 && qIndex <= 127)
    require(filterLevel >= 0 && filterLevel <= 63)
    require(sharpness >= 0 && sharpness <= 7)
    val mbCols = (width + 15) >> 4
    val mbRows = (height + 15) >> 4
    val nMbs = mbRows * mbCols
    require(yLv.length == nMbs && uLv.length == nMbs && vLv.length == nMbs)
    require((segLfAbs == null) == (segIds == null))
    if (segIds != null) {
      require(segIds.length == nMbs && segLfAbs.length == 4)
      require(segIds.forall(id => id >= 0 && id < 4))
    }
    val bd = new BoolEnc
    bd.literal(0, 1) // color space
    bd.literal(0, 1) // clamping
    if (segLfAbs == null) bd.bool(0, 128) // segmentation off
    else {
      bd.bool(1, 128) // segmentation enabled
      bd.bool(1, 128) // update map
      bd.bool(1, 128) // update feature data
      bd.bool(1, 128) // ABSOLUTE value mode
      var i = 0
      while (i < 4) { // per-segment abs quantizer = qIndex (no-op shift)
        bd.bool(1, 128); bd.signedLiteral(qIndex, 7); i += 1
      }
      i = 0
      while (i < 4) { // per-segment abs loop-filter level
        bd.bool(1, 128); bd.signedLiteral(segLfAbs(i), 6); i += 1
      }
      i = 0
      while (i < 3) { // segment-map tree probs: flat 128
        bd.bool(1, 128); bd.literal(128, 8); i += 1
      }
    }
    bd.literal(filterType, 1)
    bd.literal(filterLevel, 6)
    bd.literal(sharpness, 3)
    if (refDeltaIntra == 0 && modeDeltaBPred == 0) bd.bool(0, 128) // lf adj off
    else {
      bd.bool(1, 128) // lf delta enabled
      bd.bool(1, 128) // lf delta update
      // 4 ref deltas ([0] = INTRA_FRAME) then 4 mode deltas ([0] = B_PRED)
      val deltas = Array(refDeltaIntra, 0, 0, 0, modeDeltaBPred, 0, 0, 0)
      var d = 0
      while (d < 8) {
        if (deltas(d) == 0) bd.bool(0, 128)
        else { bd.bool(1, 128); bd.signedLiteral(deltas(d), 6) }
        d += 1
      }
    }
    bd.literal(0, 2) // 1 token partition
    bd.literal(qIndex, 7)
    var i = 0
    while (i < 5) { bd.bool(0, 128); i += 1 } // no quant deltas
    bd.bool(0, 128) // refresh entropy probs
    var pl = 0
    while (pl < 4) { // no coeff prob updates
      var band = 0
      while (band < 8) {
        var ctx = 0
        while (ctx < 3) {
          var n = 0
          while (n < 11) {
            bd.bool(0, CoeffUpdateProbs(pl)(band)(ctx)(n)); n += 1
          }
          ctx += 1
        }
        band += 1
      }
      pl += 1
    }
    bd.bool(0, 128) // mb_no_skip_coeff OFF: every MB carries tokens
    var mb = 0
    while (mb < nMbs) {
      if (segIds != null) { // segment id: (id >= 2, id & 1) on the tree
        val id = segIds(mb)
        bd.bool(if (id >= 2) 1 else 0, 128)
        bd.bool(id & 1, 128)
      }
      bd.tree(KfYModeTree, KfYModeProbs, DC_PRED)
      bd.tree(UvModeTree, KfUvModeProbs, DC_PRED)
      mb += 1
    }
    val part1 = bd.toBytes

    val te = new BoolEnc
    // mirror the decoder's neighbor-context walk exactly
    val aboveY2 = new Array[Boolean](mbCols)
    val aboveU = new Array[Boolean](mbCols * 2)
    val aboveV = new Array[Boolean](mbCols * 2)
    var mby = 0
    while (mby < mbRows) {
      var leftY2 = false
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var mbx = 0
      while (mbx < mbCols) {
        val mi = mby * mbCols + mbx
        val ctx2 = (if (aboveY2(mbx)) 1 else 0) + (if (leftY2) 1 else 0)
        val nz2 = writeDcToken(te, 1, yLv(mi), ctx2)
        aboveY2(mbx) = nz2; leftY2 = nz2
        var sb = 0
        while (sb < 16) { // empty Y blocks: first coeff 1, ctx stays 0
          te.tree(CoeffTree, DefaultCoeffProbs(0)(CoeffBands(1))(0), EOB)
          sb += 1
        }
        var ub = 0
        while (ub < 4) {
          val bx = ub & 1; val by = ub >> 1
          val ctx = (if (aboveU(mbx * 2 + bx)) 1 else 0) +
            (if (leftU(by)) 1 else 0)
          val nz = writeDcToken(te, 2, uLv(mi), ctx)
          aboveU(mbx * 2 + bx) = nz; leftU(by) = nz
          ub += 1
        }
        var vb = 0
        while (vb < 4) {
          val bx = vb & 1; val by = vb >> 1
          val ctx = (if (aboveV(mbx * 2 + bx)) 1 else 0) +
            (if (leftV(by)) 1 else 0)
          val nz = writeDcToken(te, 2, vLv(mi), ctx)
          aboveV(mbx * 2 + bx) = nz; leftV(by) = nz
          vb += 1
        }
        mbx += 1
      }
      mby += 1
    }
    packKeyFrame(width, height, part1, te.toBytes)
  }

  /** Fixture: a single-MB (16×16) key frame whose FIRST luma block
   *  carries arbitrary quantized coefficient LEVELS in zigzag-scan
   *  order (index = scan position c; position 0 is ignored — the DC
   *  rides the empty Y2 block and is 0). Exercises the token paths the
   *  solid fixture can't: zero runs (the no-EOB-after-zero tree
   *  offset), band progression, context transitions 0→1→2, category
   *  extra bits mid-block, and the full-block no-trailing-EOB case.
   *  Everything else (Y2, other Y blocks, chroma) codes empty. */
  def encodeCoeffBlock(levels: Array[Int], qIndex: Int = 0,
      filterType: Int = 0, filterLevel: Int = 0,
      sharpness: Int = 0): Array[Byte] = {
    require(levels.length == 16)
    val bd = new BoolEnc
    bd.literal(0, 1); bd.literal(0, 1) // color space, clamping
    bd.bool(0, 128) // segmentation off
    bd.literal(filterType, 1); bd.literal(filterLevel, 6)
    bd.literal(sharpness, 3)
    bd.bool(0, 128) // lf adj off
    bd.literal(0, 2) // 1 token partition
    bd.literal(qIndex, 7)
    var i = 0
    while (i < 5) { bd.bool(0, 128); i += 1 }
    bd.bool(0, 128) // refresh entropy probs
    var pl = 0
    while (pl < 4) {
      var band = 0
      while (band < 8) {
        var ctx = 0
        while (ctx < 3) {
          var n = 0
          while (n < 11) {
            bd.bool(0, CoeffUpdateProbs(pl)(band)(ctx)(n)); n += 1
          }
          ctx += 1
        }
        band += 1
      }
      pl += 1
    }
    bd.bool(0, 128) // mb_no_skip_coeff OFF: every MB carries tokens
    bd.tree(KfYModeTree, KfYModeProbs, DC_PRED)
    bd.tree(UvModeTree, KfUvModeProbs, DC_PRED)
    val part1 = bd.toBytes

    val te = new BoolEnc
    val probs = DefaultCoeffProbs
    /** Write one block's token stream mirroring the decoder's context
     *  walk exactly. `levels(c)` is the level at scan position c. */
    def writeBlock(plane: Int, first: Int, lv: Array[Int],
        ctx0: Int): Boolean = {
      var lastNz = 15
      while (lastNz >= first && lv(lastNz) == 0) lastNz -= 1
      var ctx = ctx0
      var skipEob = false
      var c = first
      if (lastNz < first) {
        te.tree(CoeffTree, probs(plane)(CoeffBands(first))(ctx0), EOB)
        return false
      }
      while (c <= lastNz) {
        val band = CoeffBands(c)
        val v = lv(c)
        if (v == 0) {
          te.tree(CoeffTree, probs(plane)(band)(ctx), DCT_0,
            if (skipEob) 2 else 0)
          ctx = 0; skipEob = true
        } else {
          val mag = math.abs(v)
          var ci = 0
          val tok =
            if (mag <= 4) mag
            else {
              while (ci < 5 && mag >= CatBases(ci + 1)) ci += 1
              CAT1 + ci
            }
          te.tree(CoeffTree, probs(plane)(band)(ctx), tok,
            if (skipEob) 2 else 0)
          if (tok >= CAT1) {
            val cp = CatProbs(ci)
            val extra = mag - CatBases(ci)
            var k = 0
            while (k < cp.length) {
              te.bool((extra >> (cp.length - 1 - k)) & 1, cp(k)); k += 1
            }
          }
          te.bool(if (v < 0) 1 else 0, 128)
          ctx = if (mag > 1) 2 else 1
          skipEob = false
        }
        c += 1
      }
      if (c < 16) // a full block (lastNz == 15) carries no trailing EOB
        te.tree(CoeffTree, probs(plane)(CoeffBands(c))(ctx), EOB)
      true
    }
    val empty = new Array[Int](16)
    writeBlock(1, 0, empty, 0) // Y2: empty
    val nz0 = writeBlock(0, 1, levels, 0) // Y block 0 carries the levels
    // blocks 1..15: empty; contexts follow the decoder's above/left walk
    var sb = 1
    while (sb < 16) {
      val bx = sb & 3; val by = sb >> 2
      // above/left nonzero inside this MB: only block 0 can be nonzero
      val ctx = (if (by > 0 && (sb - 4) == 0 && nz0) 1 else 0) +
        (if (bx > 0 && (sb - 1) == 0 && nz0) 1 else 0)
      writeBlock(0, 1, empty, ctx)
      sb += 1
    }
    var cb = 0
    while (cb < 8) { writeBlock(2, 0, empty, 0); cb += 1 }
    val part2 = te.toBytes

    val out = new java.io.ByteArrayOutputStream(part1.length + part2.length + 16)
    val tag = (part1.length << 5) | (1 << 4)
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
    out.write((tag >> 16) & 0xFF)
    out.write(0x9D); out.write(0x01); out.write(0x2A)
    out.write(16); out.write(0); out.write(16); out.write(0)
    out.write(part1, 0, part1.length)
    out.write(part2, 0, part2.length)
    out.toByteArray
  }

  /** Closed-form solid-frame luma the oracle replays:
   *  Y = clamp(128 + (((w·q_y2dc + 3) >> 3) + 4) >> 3) — dequant, the
   *  DC-only iWHT, the DC-only iDCT, DC prediction from nothing. */
  def solidY(w: Int, qIndex: Int): Int = {
    val q = resolveQuant(qIndex, 0, 0, 0, 0, 0)
    clamp255(128 + ((((w * q.y2dc) + 3) >> 3) + 4 >> 3))
  }

  /** Closed-form solid-frame chroma: no WHT stage —
   *  clamp(128 + ((w·q_uvdc + 4) >> 3)). */
  def solidUv(w: Int, qIndex: Int): Int = {
    val q = resolveQuant(qIndex, 0, 0, 0, 0, 0)
    clamp255(128 + ((w * q.uvdc + 4) >> 3))
  }

  /** Wrap a raw VP8 frame in a minimal RIFF/WebP container. */
  def webpWrap(frame: Array[Byte]): Array[Byte] = {
    val padded = frame.length + (frame.length & 1)
    val out = java.nio.ByteBuffer.allocate(12 + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + padded)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8 ".getBytes("US-ASCII")).putInt(frame.length)
    out.put(frame)
    if ((frame.length & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Codec-contract face: (w, h, 3, "yuv420", row-major Y,U,V floats
   *  in [0,1]); chroma upsampled by 2×2 replication (deterministic). */
  def decodeToYuv(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
    val f = decodeFrame(p)
    val out = new Array[Float](f.width * f.height * 3)
    var y = 0
    while (y < f.height) {
      var x = 0
      while (x < f.width) {
        val o = (y * f.width + x) * 3
        out(o) = f.y(y * f.yStride + x) / 255f
        out(o + 1) = f.u((y >> 1) * f.uvStride + (x >> 1)) / 255f
        out(o + 2) = f.v((y >> 1) * f.uvStride + (x >> 1)) / 255f
        x += 1
      }
      y += 1
    }
    (f.width, f.height, 3, "yuv420", out)
  }
}
