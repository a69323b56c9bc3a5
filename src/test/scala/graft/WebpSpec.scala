package graft

import graft.operators.Webp
import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) codec: round-trips across every decoder path —
 *  literals, all four transforms (all 14 predictor modes), color cache,
 *  LZ77 runs, palette bundling tiers — plus the named-failure contract.
 *  No independent WebP decoder exists in this sandbox (unlike ImageIO
 *  for PNG/JPEG/GIF), so these are self-consistency proofs over real
 *  RFC 9649 bitstreams; per-pixel expectations are computed from the
 *  input, never from the codec. */
class WebpSpec extends AnyFunSuite {

  private def rnd(seed: Int) = new scala.util.Random(seed)

  private def randomArgb(w: Int, h: Int, seed: Int,
      opaque: Boolean = false): Array[Int] = {
    val r = rnd(seed)
    Array.fill(w * h)(
      (if (opaque) 0xFF000000 else r.nextInt() & 0xFF000000.toInt) |
        (r.nextInt() & 0xFFFFFF))
  }

  private def roundTrip(w: Int, h: Int, px: Array[Int],
      opts: Webp.EncodeOpts = Webp.EncodeOpts()): Unit = {
    val bytes = Webp.encodeWebpLossless(w, h, px, opts)
    assert(Webp.isWebp(bytes))
    val (dw, dh, dc, fmt, out) = Webp.decodeWebp(bytes)
    assert((dw, dh, dc, fmt) == ((w, h, 4, "webp")))
    for (i <- px.indices) {
      val v = px(i)
      val got = (math.round(out(4 * i + 3) * 255).toInt << 24) |
        (math.round(out(4 * i) * 255).toInt << 16) |
        (math.round(out(4 * i + 1) * 255).toInt << 8) |
        math.round(out(4 * i + 2) * 255).toInt
      assert(got == v,
        f"pixel $i: got 0x$got%08X want 0x$v%08X (opts $opts)")
    }
  }

  test("literal-coded ARGB round-trips bit-exactly (normal prefix codes, " +
      "CL coding, canonical assignment)") {
    roundTrip(7, 5, randomArgb(7, 5, 1))
    roundTrip(1, 1, Array(0x80402010))
    roundTrip(16, 1, randomArgb(16, 1, 2))
  }

  test("subtract-green and cross-color transforms invert exactly") {
    roundTrip(6, 4, randomArgb(6, 4, 3),
      Webp.EncodeOpts(subtractGreen = true))
    // cross-color element: green_to_red in blue lane, green_to_blue in
    // green lane, red_to_blue in red lane (signed bytes)
    roundTrip(6, 4, randomArgb(6, 4, 4),
      Webp.EncodeOpts(colorCte = 0x00E31AC5))
    roundTrip(6, 4, randomArgb(6, 4, 5),
      Webp.EncodeOpts(subtractGreen = true, colorCte = 0x007F80FF))
  }

  test("ALL 14 predictor modes invert exactly (incl. Select and the " +
      "clamped add/subtract pair), alone and stacked on subtract-green") {
    for (mode <- 0 to 13) {
      roundTrip(9, 6, randomArgb(9, 6, 100 + mode),
        Webp.EncodeOpts(predictorMode = mode))
      roundTrip(5, 4, randomArgb(5, 4, 200 + mode),
        Webp.EncodeOpts(subtractGreen = true, predictorMode = mode))
    }
  }

  test("color cache hits round-trip (few distinct colors force cache " +
      "symbols) at several cache sizes") {
    val r = rnd(6)
    val colors = Array.fill(4)(r.nextInt() | 0xFF000000)
    val px = Array.fill(12 * 7)(colors(r.nextInt(4)))
    for (bits <- Seq(1, 4, 11))
      roundTrip(12, 7, px, Webp.EncodeOpts(cacheBits = bits))
  }

  test("LZ77 dist-1 runs round-trip, alone and with a color cache") {
    val r = rnd(7)
    val px = new Array[Int](20 * 9)
    var i = 0
    while (i < px.length) {
      val v = r.nextInt() | 0xFF000000
      val run = 1 + r.nextInt(30)
      var j = 0
      while (j < run && i < px.length) { px(i) = v; i += 1; j += 1 }
    }
    roundTrip(20, 9, px, Webp.EncodeOpts(rle = true))
    roundTrip(20, 9, px, Webp.EncodeOpts(rle = true, cacheBits = 6))
    // a run longer than one row exercises the copy loop across rows
    roundTrip(4, 40, Array.fill(160)(0xFF123456), Webp.EncodeOpts(rle = true))
  }

  test("palette (color-indexing) round-trips at every bundling tier: " +
      "2 colors (8 px/byte), 4 (4), 16 (2), 40 (unbundled)") {
    val r = rnd(8)
    for (k <- Seq(2, 3, 4, 5, 16, 17, 40)) {
      val pal = Array.fill(k)(r.nextInt()) // palette may carry alpha
      val idx = Array.fill(11 * 5)(r.nextInt(k).toByte)
      val bytes = Webp.encodeWebpPalette(11, 5, pal, idx)
      val (dw, dh, _, _, out) = Webp.decodeWebp(bytes)
      assert(dw == 11 && dh == 5)
      for (i <- idx.indices) {
        val v = pal(idx(i) & 0xFF)
        val got = (math.round(out(4 * i + 3) * 255).toInt << 24) |
          (math.round(out(4 * i) * 255).toInt << 16) |
          (math.round(out(4 * i + 1) * 255).toInt << 8) |
          math.round(out(4 * i + 2) * 255).toInt
        assert(got == v, f"k=$k pixel $i: 0x$got%08X != 0x$v%08X")
      }
    }
  }

  test("animated WebP: VP8X/ANIM/ANMF decode composites replace frames, " +
      "dispose-to-background, and alpha blending; the still decoder " +
      "keeps rejecting animations by name") {
    val p = Array.tabulate(8)(i => 0xFF000000 | (i * 0x050301 + 0x101010))
    val anim = Webp.encodeAnimatedWebp(4, 2, Seq(
      Webp.Frame(0, 0, 4, 2, p),
      Webp.Frame(2, 0, 2, 1, Array(p(0), p(1)), disposeBg = true),
      Webp.Frame(0, 0, 1, 1, Array(p(7)))))
    val (cw, chh, frames) = Webp.decodeWebpFrames(anim)
    assert(cw == 4 && chh == 2 && frames.length == 3)
    def px(f: Int, i: Int): Int =
      (math.round(frames(f)(4 * i + 3) * 255).toInt << 24) |
        (math.round(frames(f)(4 * i) * 255).toInt << 16) |
        (math.round(frames(f)(4 * i + 1) * 255).toInt << 8) |
        math.round(frames(f)(4 * i + 2) * 255).toInt
    for (i <- 0 until 8) assert(px(0, i) == p(i), s"frame0 pixel $i")
    // frame 1: (2,0)<-p0, (3,0)<-p1, rest unchanged
    assert(px(1, 2) == p(0) && px(1, 3) == p(1) && px(1, 0) == p(0) &&
      px(1, 4) == p(4))
    // frame 2: dispose cleared (2,0)/(3,0) to transparent bg; (0,0)<-p7
    assert(px(2, 2) == 0 && px(2, 3) == 0, "dispose-to-background missed")
    assert(px(2, 0) == p(7) && px(2, 1) == p(1) && px(2, 7) == p(7))
    // alpha blending: a half-transparent red frame over opaque blue —
    // expectations computed from the container-spec src-over formula
    val blue = Array.fill(4)(0xFF0000FF)
    val red = Array.fill(4)(0x80FF0000)
    val blended = Webp.decodeWebpFrames(Webp.encodeAnimatedWebp(2, 2, Seq(
      Webp.Frame(0, 0, 2, 2, blue),
      Webp.Frame(0, 0, 2, 2, red, blend = true))))._3(1)
    val sa = 0x80; val oa = sa + 255 * (255 - sa) / 255.0
    val wantR = math.round(255.0 * sa / oa).toInt
    val wantB = math.round(255 * 255 * ((255 - sa) / 255.0) / oa).toInt
    val gotA = math.round(blended(3) * 255).toInt
    assert(gotA == math.round(oa).toInt, s"blend alpha $gotA")
    assert(math.round(blended(0) * 255).toInt == wantR &&
      math.round(blended(2) * 255).toInt == wantB, "blend rgb drifted")
    // the still-image API stays a named rejection on animations
    val eA = intercept[IllegalArgumentException](Webp.decodeWebp(anim))
    assert(eA.getMessage.contains("animated"), eA.getMessage)
    // odd frame offsets are unrepresentable in the container
    val eO = intercept[IllegalArgumentException](Webp.encodeAnimatedWebp(
      4, 2, Seq(Webp.Frame(1, 0, 1, 1, Array(p(0))))))
    assert(eO.getMessage.contains("even"), eO.getMessage)
  }

  test("named failures: lossy VP8, animation, bad signature/version, " +
      "truncation") {
    val good = Webp.encodeWebpLossless(3, 3, randomArgb(3, 3, 9))
    // relabel the chunk VP8L -> 'VP8 ': now ROUTES to the Vp8 key-frame
    // decoder, which rejects the garbage payload with a named error
    val lossy = good.clone()
    lossy(15) = ' '
    val eL = intercept[IllegalArgumentException](Webp.decodeWebp(lossy))
    assert(eL.getMessage.contains("VP8"), eL.getMessage)
    // animation chunk
    val anim = good.clone()
    anim(12) = 'A'; anim(13) = 'N'; anim(14) = 'I'; anim(15) = 'M'
    val eA = intercept[IllegalArgumentException](Webp.decodeWebp(anim))
    assert(eA.getMessage.contains("animated"), eA.getMessage)
    // bad VP8L signature byte
    val sig = good.clone(); sig(20) = 0x2E
    val eS = intercept[IllegalArgumentException](Webp.decodeWebp(sig))
    assert(eS.getMessage.contains("signature"), eS.getMessage)
    // truncated bitstream
    val eT = intercept[IllegalArgumentException](
      Webp.decodeWebp(java.util.Arrays.copyOf(good, good.length - 2)))
    assert(eT.getMessage.contains("truncated"), eT.getMessage)
  }

  // ------------------------------------------------------ lossy + ALPH

  /** Test-side forward of the container spec's alpha filters (mirrors
   *  the decoder's inverse: residual = value - predictor mod 256). */
  private def forwardAlpha(alpha: Array[Int], w: Int, h: Int,
      filt: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val pred =
        if (filt == 0 || (x == 0 && y == 0)) 0
        else if (filt == 1) { if (x == 0) alpha(i - w) else alpha(i - 1) }
        else if (filt == 2) { if (y == 0) alpha(i - 1) else alpha(i - w) }
        else {
          if (x == 0) alpha(i - w)
          else if (y == 0) alpha(i - 1)
          else math.max(0, math.min(255,
            alpha(i - 1) + alpha(i - w) - alpha(i - w - 1)))
        }
      (alpha(i) - pred) & 0xFF
    }

  test("lossy + ALPH: filter inversion anchored on hand-computed 2x2 " +
      "values for all four methods (raw compression)") {
    // stored residuals [10,20,30,40]:
    //   none       → [10,20,30,40]
    //   horizontal → [10, 30, 40, 40+40=80]   (left col predicts from above)
    //   vertical   → [10, 30, 40, 40+30=70]   (top row predicts from left)
    //   gradient   → [10, 30, 40, 40+clip(40+30-10)=100]
    val frame2 = graft.operators.Vp8.encodeSolid(2, 2, 0, 0, 0, 0)
    def dec2(filt: Int): Seq[Int] = {
      val webp = Webp.lossyAlphaWrap(2, 2, frame2, filt << 2,
        Array[Byte](10, 20, 30, 40))
      val (_, _, _, _, px) = Webp.decodeWebp(webp)
      (0 until 4).map(i => math.round(px(4 * i + 3) * 255))
    }
    assert(dec2(0) == Seq(10, 20, 30, 40))
    assert(dec2(1) == Seq(10, 30, 40, 80))
    assert(dec2(2) == Seq(10, 30, 40, 70))
    assert(dec2(3) == Seq(10, 30, 40, 100))
  }

  test("lossy + ALPH: VP8L-compressed alpha (headerless stream, green " +
      "channel) round-trips a random plane under every filter method; " +
      "luma stays the VP8 closed form") {
    val (w, h) = (32, 16)
    val rng = rnd(77)
    val alpha = Array.fill(w * h)(rng.nextInt(256))
    val frame = graft.operators.Vp8.encodeSolid(w, h, 9, 3, -3, 0)
    val ey = graft.operators.Vp8.solidY(9, 0)
    for (filt <- 0 to 3) {
      val body = Webp.encodeAlphVp8l(w, h, forwardAlpha(alpha, w, h, filt))
      val webp = Webp.lossyAlphaWrap(w, h, frame, (filt << 2) | 1, body)
      val (dw, dh, ch, fmt, px) = Webp.decodeWebp(webp)
      assert((dw, dh, ch, fmt) == (w, h, 4, "yuva420"))
      for (i <- 0 until w * h) {
        assert(math.round(px(4 * i + 3) * 255) == alpha(i),
          s"filter $filt alpha $i")
        assert(math.round(px(4 * i) * 255) == ey, s"filter $filt Y $i")
      }
    }
  }

  test("lossy + ALPH named failures: reserved compression method, " +
      "raw payload size mismatch") {
    val frame = graft.operators.Vp8.encodeSolid(2, 2, 0, 0, 0, 0)
    val e1 = intercept[IllegalArgumentException](Webp.decodeWebp(
      Webp.lossyAlphaWrap(2, 2, frame, 0x02, Array[Byte](1, 2, 3, 4))))
    assert(e1.getMessage.contains("compression"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Webp.decodeWebp(
      Webp.lossyAlphaWrap(2, 2, frame, 0x00, Array[Byte](1, 2, 3))))
    assert(e2.getMessage.contains("ALPH"), e2.getMessage)
  }

  test("meta prefix-code image: a two-group stream decodes with " +
      "per-tile code selection") {
    // 8x4 image, metaBits=2 (4x4 tiles) -> a 2x1 meta image selecting
    // group 0 for the left tile, group 1 for the right. The two halves
    // use DISJOINT literal alphabets (left: red gradient, right: blue
    // gradient), so decoding any right-tile pixel with group 0's codes
    // either desyncs or produces a red value the assertion catches —
    // a decoder ignoring the meta image cannot pass.
    val w = 8; val h = 4
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (x < 4) 0xFF000000 | ((16 + x + 8 * y) << 16) // left: reds
      else 0xFF000000 | (200 + x + 8 * y)              // right: blues
    }
    val bytes = Webp.encodeWebpLosslessMeta(w, h, px, metaBits = 2,
      groupOfTile = Array(0, 1))
    val (dw, dh, ch, _, out) = Webp.decodeWebp(bytes)
    assert(dw == w && dh == h && ch == 4)
    for (i <- 0 until w * h) {
      val x = i % w; val y = i / w
      val rr = math.round(out(4 * i) * 255).toInt
      val bb = math.round(out(4 * i + 2) * 255).toInt
      if (x < 4)
        assert(rr == 16 + x + 8 * y && bb == 0, s"left tile pixel ($x,$y)")
      else
        assert(rr == 0 && bb == 200 + x + 8 * y, s"right tile pixel ($x,$y)")
    }

    // three groups exercise group indices beyond 1 and a non-trivial
    // meta-image huffman alphabet (12 tiles: wider than 16px)
    val w2 = 24; val px2 = Array.tabulate(w2 * 8) { i =>
      val x = i % w2
      0xFF000000 | (((x / 4) % 3 + 1) << 8 | (i % 7)) // green by group, blue noise
    }
    val tiles2 = Array.tabulate(6 * 2)(t => t % 6 % 3) // 6x2 tile grid
    val (d2w, _, _, _, out2) = Webp.decodeWebp(
      Webp.encodeWebpLosslessMeta(w2, 8, px2, metaBits = 2, tiles2))
    assert(d2w == w2)
    for (i <- 0 until w2 * 8) {
      val gg = math.round(out2(4 * i + 1) * 255).toInt
      assert(gg == ((i % w2) / 4 % 3 + 1), s"3-group pixel $i")
    }
  }
}
