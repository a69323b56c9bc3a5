package graft

import graft.operators.Vp8
import graft.operators.Vp8.Vp8Tables._
import org.scalatest.funsuite.AnyFunSuite

class Vp8Spec extends AnyFunSuite {

  test("bool coder round-trip: adversarial random bit/prob sequences") {
    val rnd = new scala.util.Random(0xC0DEC)
    for (trial <- 0 until 20) {
      val n = 200 + rnd.nextInt(3000)
      val bits = Array.fill(n)(rnd.nextInt(2))
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      // skew some trials toward extreme probs (carry stress: long 0xFF runs)
      if (trial % 3 == 0) {
        var i = 0
        while (i < n) { probs(i) = if (bits(i) == 1) 1 else 254; i += 1 }
      }
      val enc = new Vp8.BoolEnc
      var i = 0
      while (i < n) { enc.bool(bits(i), probs(i)); i += 1 }
      val bytes = enc.toBytes
      val dec = new Vp8.BoolDec(bytes, 0, bytes.length)
      i = 0
      while (i < n) {
        assert(dec.bool(probs(i)) == bits(i), s"trial $trial bit $i")
        i += 1
      }
    }
  }

  test("bool coder round-trip: literals, signed literals, trees") {
    val enc = new Vp8.BoolEnc
    enc.literal(0x5A, 8)
    enc.signedLiteral(-13, 6)
    enc.tree(CoeffTree, Array.fill(11)(128), CAT3)
    enc.tree(KfYModeTree, KfYModeProbs, TM_PRED)
    enc.tree(CoeffTree, Array.fill(11)(128), DCT_0) // leaf encoded as 0
    val b = enc.toBytes
    val dec = new Vp8.BoolDec(b, 0, b.length)
    assert(dec.literal(8) == 0x5A)
    assert(dec.signedLiteral(6) == -13)
    assert(dec.tree(CoeffTree, Array.fill(11)(128)) == CAT3)
    assert(dec.tree(KfYModeTree, KfYModeProbs) == TM_PRED)
    assert(dec.tree(CoeffTree, Array.fill(11)(128)) == DCT_0)
  }

  test("inverse transforms: DC-only closed forms and linearity sanity") {
    for (d <- Seq(-500, -64, -8, 0, 7, 64, 513)) {
      val dct = Vp8.idct4x4 { val a = new Array[Int](16); a(0) = d; a }
      assert(dct.forall(_ == (d + 4) >> 3), s"idct dc $d")
      val wht = Vp8.iwht4x4 { val a = new Array[Int](16); a(0) = d; a }
      assert(wht.forall(_ == (d + 3) >> 3), s"iwht dc $d")
    }
    // a pure-AC input must not leak into the DC sum identically
    val ac = Vp8.idct4x4 { val a = new Array[Int](16); a(1) = 100; a }
    assert(ac.distinct.length > 1)
  }

  test("idct4x4 matches an INDEPENDENT float butterfly reference within " +
      "rounding (guards the fixed-point constants — a transposed " +
      "multiplier cannot pass, unlike the self-referential checks)") {
    val alpha = math.sqrt(2) * math.cos(math.Pi / 8) // 1.30656...
    val beta = math.sqrt(2) * math.sin(math.Pi / 8) // 0.54120...
    def ref(in: Array[Int]): Array[Double] = {
      def pass(v: Array[Double], stride: Int, base: Int => Int): Unit = {
        for (i <- 0 until 4) {
          val i0 = v(base(i)); val i1 = v(base(i) + stride)
          val i2 = v(base(i) + 2 * stride); val i3 = v(base(i) + 3 * stride)
          val a1 = i0 + i2; val b1 = i0 - i2
          val c1 = i1 * beta - i3 * alpha
          val d1 = i1 * alpha + i3 * beta
          v(base(i)) = a1 + d1; v(base(i) + stride) = b1 + c1
          v(base(i) + 2 * stride) = b1 - c1; v(base(i) + 3 * stride) = a1 - d1
        }
      }
      val v = in.map(_.toDouble)
      pass(v, 4, i => i) // columns
      pass(v, 1, i => i * 4) // rows
      v.map(_ / 8.0)
    }
    val rnd = new scala.util.Random(0x1DC7)
    for (_ <- 0 until 50) {
      val in = Array.fill(16)(rnd.nextInt(801) - 400)
      val got = Vp8.idct4x4(in)
      val want = ref(in)
      for (i <- 0 until 16)
        assert(math.abs(got(i) - want(i)) <= 2.0,
          s"idct drift at $i: ${got(i)} vs ${want(i)} for ${in.toSeq}")
    }
  }

  test("solid key frame: every pixel matches the closed form across " +
      "coefficient magnitudes (incl. cat tokens), signs and quantizers") {
    for {
      (wY, wU, wV, qi) <- Seq(
        (3, 2, -2, 0), // small DCT tokens
        (0, 0, 0, 0), // empty blocks: immediate EOB everywhere
        (5, 6, 7, 0), // CAT1/CAT2 extra bits
        (12, 20, 40, 0), // CAT3/CAT4/CAT5
        (70, -70, 1, 0), // CAT6 + sign
        (-9, 4, -4, 17), // mid quantizer
        (2, 1, -1, 63)) // high quantizer
    } {
      val frame = Vp8.encodeSolid(32, 32, wY, wU, wV, qi)
      val f = Vp8.decodeFrame(frame)
      val ey = Vp8.solidY(wY, qi)
      val eu = Vp8.solidUv(wU, qi)
      val ev = Vp8.solidUv(wV, qi)
      assert(f.width == 32 && f.height == 32)
      assert(f.y.forall(_ == ey), s"Y($wY,$wU,$wV,q$qi): got ${f.y.toSet}, want $ey")
      assert(f.u.forall(_ == eu), s"U($wY,$wU,$wV,q$qi)")
      assert(f.v.forall(_ == ev), s"V($wY,$wU,$wV,q$qi)")
    }
  }

  test("solid key frame: non-multiple-of-16 dims crop; skip+DC " +
      "prediction propagates across macroblock rows and columns") {
    val frame = Vp8.encodeSolid(40, 24, 10, 3, -3, 0)
    val (w, h, ch, fmt, px) = Vp8.decodeToYuv(frame)
    assert((w, h, ch, fmt) == (40, 24, 3, "yuv420"))
    assert(px.length == 40 * 24 * 3)
    val ey = Vp8.solidY(10, 0) / 255f
    val eu = Vp8.solidUv(3, 0) / 255f
    val ev = Vp8.solidUv(-3, 0) / 255f
    var i = 0
    while (i < px.length) {
      assert(px(i) == ey && px(i + 1) == eu && px(i + 2) == ev, s"px $i")
      i += 3
    }
  }

  test("decode pixel budget is configurable: a frame over the budget " +
      "rejects by name, raising the budget admits it, reset restores") {
    val frame = Vp8.encodeSolid(512, 512, 3, 0, 0, 0) // 2^18 px
    assert(Vp8.decodeFrame(frame).width == 512) // under the 2^24 default
    try {
      Vp8.setMaxPixels(1L << 16)
      val e = intercept[IllegalArgumentException](Vp8.decodeFrame(frame))
      assert(e.getMessage.contains("pixel budget"), e.getMessage)
      Vp8.setMaxPixels(1L << 26) // the large-still deployment shape
      assert(Vp8.decodeFrame(frame).width == 512)
    } finally Vp8.setMaxPixels(1L << 24)
    val bad = intercept[IllegalArgumentException](Vp8.setMaxPixels(1L << 40))
    assert(bad.getMessage.contains("[2^16, 2^28]"))
  }

  test("conformance table seam is drop-in: an alternative table set " +
      "loads through loadCoeffTables, the decoder CONSUMES it (a fixture " +
      "encoded under the placeholder set stops decoding), the encoder " +
      "reads through the same seam, and reset restores the placeholder — " +
      "the RFC 6386 appendix swap is one data load, zero code") {
    import graft.operators.Vp8.Vp8Tables
    val ey = Vp8.solidY(12, 0)
    val frame = Vp8.encodeSolid(32, 32, 12, 20, 40, 0) // CAT3+ tokens: deep tree reads
    assert(Vp8.decodeFrame(frame).y.forall(_ == ey))
    val p = Vp8Tables.PlaceholderTables
    val perturbed = Vp8Tables.CoeffTables(
      p.defaultCoeffProbs.map(_.map(_.map(_.map(v => 256 - v)))),
      p.coeffUpdateProbs, p.kfBModeProbs)
    try {
      Vp8Tables.loadCoeffTables(perturbed)
      // the placeholder-encoded fixture must NOT survive the swap: a
      // decoder that ignored the seam would still read ey everywhere
      val diverged =
        try !Vp8.decodeFrame(frame).y.forall(_ == ey)
        catch { case _: Exception => true } // desync traps are fine too
      assert(diverged, "decoder ignored the swapped table set")
      // the seam is symmetric: a fixture encoded UNDER the swapped set
      // round-trips under it
      assert(Vp8.decodeFrame(Vp8.encodeSolid(32, 32, 12, 20, 40, 0))
        .y.forall(_ == ey))
    } finally Vp8Tables.resetCoeffTables()
    // placeholder restored: the original fixture decodes again
    assert(Vp8.decodeFrame(frame).y.forall(_ == ey))
    // a transposed/truncated data file fails at LOAD, by name
    val bad = intercept[IllegalArgumentException](Vp8Tables.loadCoeffTables(
      Vp8Tables.CoeffTables(p.defaultCoeffProbs.take(3),
        p.coeffUpdateProbs, p.kfBModeProbs)))
    assert(bad.getMessage.contains("[4][8][3][11]"))
    val badRange = intercept[IllegalArgumentException](
      Vp8Tables.loadCoeffTables(Vp8Tables.CoeffTables(
        p.defaultCoeffProbs.map(_.map(_.map(_.map(_ => 0)))),
        p.coeffUpdateProbs, p.kfBModeProbs)))
    assert(badRange.getMessage.contains("[1, 255]"))
  }

  test("webp container round-trip routes the lossy chunk through Vp8") {
    val webp = Vp8.webpWrap(Vp8.encodeSolid(16, 16, 4, 0, 0, 0))
    val (w, h, ch, fmt, px) = graft.operators.Webp.decodeWebp(webp)
    assert((w, h, ch, fmt) == (16, 16, 3, "yuv420"))
    assert(math.round(px(0) * 255) == Vp8.solidY(4, 0))
    // lossy + ALPH (r13's named rejection) decodes since r14: the raw
    // alpha plane rides along as a 4th channel — byte i of the plane
    // must land at pixel i's alpha lane, with Y untouched
    val frame = Vp8.encodeSolid(16, 16, 4, 0, 0, 0)
    val alphaBytes = Array.tabulate(256)(i => i.toByte)
    val webpA = graft.operators.Webp.lossyAlphaWrap(16, 16, frame,
      0x00, alphaBytes)
    val (aw, ah, ach, afmt, apx) = graft.operators.Webp.decodeWebp(webpA)
    assert((aw, ah, ach, afmt) == (16, 16, 4, "yuva420"))
    assert(math.round(apx(0) * 255) == Vp8.solidY(4, 0))
    for (i <- 0 until 256)
      assert(math.round(apx(4 * i + 3) * 255) == i, s"alpha $i")
  }

  test("B_PRED sub-block predictors: hand-computed edge-default pixels") {
    val plane = new Array[Int](64) // 8x8 scratch, all zero
    // at the frame origin: A = 127*4 (+AR 127), L = 129*4, P = 127
    val dc = Vp8.predict4x4(B_DC, plane, 8, 0, 0, 0, 1)
    assert(dc.forall(_ == ((4 + 4 * 127 + 4 * 129) >> 3))) // = 128
    val ve = Vp8.predict4x4(B_VE, plane, 8, 0, 0, 0, 1)
    assert(ve.forall(_ == 127))
    val he = Vp8.predict4x4(B_HE, plane, 8, 0, 0, 0, 1)
    assert(he.forall(_ == 129))
    val hu = Vp8.predict4x4(B_HU, plane, 8, 0, 0, 0, 1)
    assert(hu.forall(_ == 129))
    val tm = Vp8.predict4x4(B_TM, plane, 8, 0, 0, 0, 1)
    assert(tm.forall(_ == 129)) // 129 + 127 - 127
    // interior: a known gradient above row drives LD's diagonal
    val p2 = new Array[Int](8 * 8)
    for (c <- 0 until 8) p2(c) = 10 * (c + 1) // row 0 = 10..80
    val ld = Vp8.predict4x4(B_LD, p2, 8, 0, 1, 4, 2)
    // (0,0): avg3(A0,A1,A2) = avg3(10,20,30) = 20
    assert(ld(0) == 20)
    // (3,3): k=6 -> avg3(A6,A7,A7) = avg3(70,80,80) = (70+160+80+2)>>2 = 78
    assert(ld(15) == 78)
    // whole-block predictors at origin
    val dc16 = Vp8.predictBlock(DC_PRED, new Array[Int](1024), 32, 0, 0, 16)
    assert(dc16.forall(_ == 128)) // no neighbors -> 128
    val v16 = Vp8.predictBlock(V_PRED, new Array[Int](1024), 32, 0, 0, 16)
    assert(v16.forall(_ == 127))
    val h8 = Vp8.predictBlock(H_PRED, new Array[Int](256), 16, 0, 0, 8)
    assert(h8.forall(_ == 129))
  }

  test("coefficient-block tokens: zero runs (no-EOB-after-zero offset), " +
      "band progression, context transitions, category extras mid-block, " +
      "zigzag placement and the full-block no-trailing-EOB case") {
    val q = 0 // y1ac quantizer = AcQLookup(0) = 4
    def decodeBlock0(levels: Array[Int]): Array[Int] = {
      val f = Vp8.decodeFrame(Vp8.encodeCoeffBlock(levels, q))
      Array.tabulate(16) { i =>
        f.y((i >> 2) * f.yStride + (i & 3))
      }
    }
    def expected(levels: Array[Int]): Array[Int] = {
      val deq = new Array[Int](16)
      for (c <- 1 until 16) deq(Zigzag(c)) = levels(c) * 4
      Vp8.idct4x4(deq).map(r => math.min(255, math.max(0, 128 + r)))
    }
    // leading zero run then a small token (skipEob across bands),
    // a negative, a CAT2 value, zeros, tail value at c=15 (full block)
    val a = Array(0, 0, 0, 2, 0, 0, -1, 9, 0, 0, 0, 0, 0, 0, 0, 3)
    assert(decodeBlock0(a).toSeq == expected(a).toSeq)
    // single big CAT6 value deep in the scan, EOB after it
    val b = new Array[Int](16); b(10) = 900
    assert(decodeBlock0(b).toSeq == expected(b).toSeq)
    // alternating signs across every scan position (no zeros, no EOB)
    val c = Array.tabulate(16)(i => if (i == 0) 0 else if (i % 2 == 0) 5 else -6)
    assert(decodeBlock0(c).toSeq == expected(c).toSeq)
    // all-empty block: pure DC prediction, everything 128
    val z = new Array[Int](16)
    assert(decodeBlock0(z).forall(_ == 128))
    // the rest of the macroblock stays flat 128 (context walk intact)
    val f = Vp8.decodeFrame(Vp8.encodeCoeffBlock(a, q))
    for (y <- 0 until 16; x <- 0 until 16 if x >= 4 || y >= 4)
      assert(f.y(y * f.yStride + x) == 128, s"spill at ($x,$y)")
  }

  test("named failures: interframe, truncation, bad start code") {
    val good = Vp8.encodeSolid(16, 16, 1, 0, 0, 0)
    val inter = good.clone(); inter(0) = (inter(0) | 1).toByte
    val eI = intercept[IllegalArgumentException](Vp8.decodeFrame(inter))
    assert(eI.getMessage.contains("interframe"))
    val sig = good.clone(); sig(3) = 0x00
    val eS = intercept[IllegalArgumentException](Vp8.decodeFrame(sig))
    assert(eS.getMessage.contains("start code"))
    val eT = intercept[IllegalArgumentException](
      Vp8.decodeFrame(java.util.Arrays.copyOf(good, 8)))
    assert(eT.getMessage.contains("truncated"))
  }

  // ------------------------------------------------- loop filter (§15)
  // All expected pixel values below are HAND-COMPUTED from the RFC 6386
  // §15.2/§15.3 pseudocode; the arithmetic is spelled out in comments.

  test("loop filter primitives: hand-computed §15.2/§15.3 adjustments") {
    // common adjust, outer taps: P1 P0 | Q0 Q1 = 120 124 | 136 134 →
    // signed -8 -4 | 8 6; a = c(c(-8-6)+3·(8-(-4))) = 22; F = 26>>3 = 3,
    // E = 25>>3 = 3 → Q0 = 8-3 = 5 (133), P0 = -4+3 = -1 (127)
    val a1 = Array(120, 124, 136, 134)
    val f1 = Vp8.commonAdjust(a1, 2, 1, useOuterTaps = true)
    assert(f1 == 3 && a1.toSeq == Seq(120, 127, 133, 134))
    // without outer taps: a = 36; F = 40>>3 = 5, E = 39>>3 = 4 →
    // Q0 = 3 (131), P0 = 0 (128)
    val a2 = Array(120, 124, 136, 134)
    Vp8.commonAdjust(a2, 2, 1, useOuterTaps = false)
    assert(a2.toSeq == Seq(120, 128, 131, 134))
    // simple mask |124-136|·2 + |120-134|/2 = 31: off at limit 30,
    // filters at 31
    val s1 = Array(120, 124, 136, 134)
    Vp8.simpleSegment(s1, 2, 1, 30)
    assert(s1.toSeq == Seq(120, 124, 136, 134))
    Vp8.simpleSegment(s1, 2, 1, 31)
    assert(s1.toSeq == Seq(120, 127, 133, 134))
    // subblock, no hev (thresh 63): 128 128 128 132 | 120 124 128 128 →
    // a = c(3·(-8-4)) = -36, F = c(-32)>>3 = -4, E = c(-33)>>3 = -5 →
    // Q0 = -8+4 = -4 (124), P0 = 4-5 = -1 (127); outer a = (F+1)>>1 = -2
    // → Q1 = -4+2 (126), P1 = 0-2 (126)
    val sb = Array(128, 128, 128, 132, 120, 124, 128, 128)
    Vp8.subblockFilter(sb, 4, 1, 63, 9, 30)
    assert(sb.toSeq == Seq(128, 128, 126, 127, 124, 126, 128, 128))
    // MB edge WITH hev (|136-124| = 12 > 1): common adjust only —
    // a = c(c(8-2)+36) = 42, F = E = 45..46>>3 = 5 → Q0 131, P0 129
    val mh = Array(130, 130, 136, 124, 136, 130, 130, 130)
    Vp8.mbEdgeFilter(mh, 4, 1, 1, 12, 46)
    assert(mh.toSeq == Seq(130, 130, 136, 129, 131, 130, 130, 130))
    // MB edge, no hev: wide 27/18/9 taps across a 144|128 step —
    // w = c(16-48) = -32; a27 = -801>>7 = -7 → 137|135;
    // a18 = -513>>7 = -5 → 139|133; a9 = -225>>7 = -2 → 142|130
    val mw = Array(144, 144, 144, 144, 128, 128, 128, 128)
    Vp8.mbEdgeFilter(mw, 4, 1, 0, 14, 46)
    assert(mw.toSeq == Seq(144, 142, 139, 137, 135, 133, 130, 128))
    // one interior diff over the limit vetoes the whole segment
    val mv = Array(144, 144, 129, 144, 128, 128, 128, 128)
    Vp8.mbEdgeFilter(mv, 4, 1, 0, 14, 46)
    assert(mv.toSeq == Seq(144, 144, 129, 144, 128, 128, 128, 128))
  }

  test("normal loop filter end-to-end: hand-computed step-edge profiles " +
      "across a 2-MB frame (luma wide taps, chroma both signs, knock-on " +
      "interior edges are no-ops by the hev/zero-adjust arithmetic)") {
    // DC tiles Y 144|128, U 136|128, V 120|128; level 14, sharpness 0:
    // interior = 14, mbedge = 2·16+14 = 46 ≥ luma mask 2·16+16/2 = 40.
    val frame = Vp8.encodeDcGrid(32, 16, Array(124, -132),
      Array(16, -16), Array(-16, 16), 0, 0, 14, 0)
    val f = Vp8.decodeFrame(frame)
    val yRow = Seq.fill(13)(144) ++ Seq(142, 139, 137, 135, 133, 130) ++
      Seq.fill(13)(128)
    for (r <- 0 until 16; c <- 0 until 32)
      assert(f.y(r * f.yStride + c) == yRow(c), s"Y($r,$c)")
    // chroma w = ∓16: a27 = ∓3, a18 = ∓2, a9 = ∓1
    val uRow = Seq.fill(5)(136) ++ Seq(135, 134, 133, 131, 130, 129) ++
      Seq.fill(5)(128)
    val vRow = Seq.fill(5)(120) ++ Seq(121, 122, 123, 125, 126, 127) ++
      Seq.fill(5)(128)
    for (r <- 0 until 8; c <- 0 until 16) {
      assert(f.u(r * f.uvStride + c) == uRow(c), s"U($r,$c)")
      assert(f.v(r * f.uvStride + c) == vRow(c), s"V($r,$c)")
    }
  }

  test("simple loop filter end-to-end: luma-only common adjust at the " +
      "MB edge; chroma passes through untouched") {
    // same fixture, filter type 1: only P0/Q0 move (F = E = -4)
    val frame = Vp8.encodeDcGrid(32, 16, Array(124, -132),
      Array(16, -16), Array(-16, 16), 0, 1, 14, 0)
    val f = Vp8.decodeFrame(frame)
    val yRow = Seq.fill(15)(144) ++ Seq(140, 132) ++ Seq.fill(15)(128)
    for (r <- 0 until 16; c <- 0 until 32)
      assert(f.y(r * f.yStride + c) == yRow(c), s"Y($r,$c)")
    for (r <- 0 until 8; c <- 0 until 16) {
      assert(f.u(r * f.uvStride + c) == (if (c < 8) 136 else 128), s"U($r,$c)")
      assert(f.v(r * f.uvStride + c) == (if (c < 8) 120 else 128), s"V($r,$c)")
    }
  }

  test("loop filter level resolution: sharpness tightens the edge " +
      "limit, the INTRA ref delta shifts the effective level, a zeroed " +
      "per-MB level disables filtering") {
    def grid(fl: Int, sharp: Int, refD: Int = 0) =
      Vp8.decodeFrame(Vp8.encodeDcGrid(32, 16, Array(124, -132),
        Array(16, -16), Array(-16, 16), 0, 0, fl, sharp,
        refDeltaIntra = refD))
    // sharpness 5: interior = min(14>>2, 9-5) = 3 → mbedge = 35 < the
    // luma mask 40 → luma MB edge vetoed; chroma mask 20 still filters
    val sharp = grid(14, 5)
    assert(sharp.y(15) == 144 && sharp.y(16) == 128,
      "sharpness must veto the luma edge")
    assert(sharp.u(7) == 133 && sharp.u(8) == 131,
      "chroma must still filter under sharpness 5")
    // frame level 8 + INTRA ref delta +6 ≡ level 14
    val delta = grid(8, 0, refD = 6)
    val base = grid(14, 0)
    assert(delta.y.sameElements(base.y) && delta.u.sameElements(base.u) &&
      delta.v.sameElements(base.v))
    // ref delta -14 zeroes every per-MB level: nothing filters
    val zeroed = grid(14, 0, refD = -14)
    assert(zeroed.y(15) == 144 && zeroed.y(16) == 128 &&
      zeroed.u(7) == 136 && zeroed.u(8) == 128)
  }

  test("loop filter interior edges on NON-FLAT content: the frame pass " +
      "equals a manual primitive walk in the spec's edge order (single " +
      "MB, no MB edges, luma + chroma interior edges, hev threshold 1)") {
    // block 0 carries mid-size AC levels at q0 -> real pixel structure
    // crossing the x=4 interior edge; level 20 => I=20, sbE=60, hevT=1
    val levels = Array(0, 14, -9, 7, 5, -6, 4, 3, -2, 2, 1, -1, 1, 1, -1, 1)
    val flat = Vp8.decodeFrame(Vp8.encodeCoeffBlock(levels, 0))
    val filt = Vp8.decodeFrame(
      Vp8.encodeCoeffBlock(levels, 0, filterType = 0, filterLevel = 20))
    assert(!flat.y.sameElements(filt.y), "fixture drifted: filter no-oped")
    // manual §15 walk over the unfiltered planes, same order as the
    // frame pass: luma interior VERTICAL b=4,8,12 (each all 16 rows),
    // chroma vertical x=4; luma interior HORIZONTAL b=4,8,12; chroma
    // horizontal y=4. Primitives are the hand-pinned ones.
    val y = flat.y.clone(); val u = flat.u.clone(); val v = flat.v.clone()
    val (hevT, interior, sbE) = (1, 20, 60)
    for (b <- Seq(4, 8, 12); r <- 0 until 16)
      Vp8.subblockFilter(y, r * flat.yStride + b, 1, hevT, interior, sbE)
    for (r <- 0 until 8) {
      Vp8.subblockFilter(u, r * flat.uvStride + 4, 1, hevT, interior, sbE)
      Vp8.subblockFilter(v, r * flat.uvStride + 4, 1, hevT, interior, sbE)
    }
    for (b <- Seq(4, 8, 12); c <- 0 until 16)
      Vp8.subblockFilter(y, (b) * flat.yStride + c, flat.yStride,
        hevT, interior, sbE)
    for (c <- 0 until 8) {
      Vp8.subblockFilter(u, 4 * flat.uvStride + c, flat.uvStride,
        hevT, interior, sbE)
      Vp8.subblockFilter(v, 4 * flat.uvStride + c, flat.uvStride,
        hevT, interior, sbE)
    }
    assert(y.sameElements(filt.y), "luma interior-edge walk diverged")
    assert(u.sameElements(filt.u) && v.sameElements(filt.v),
      "chroma interior-edge walk diverged")
  }

  test("loop filter §15.1 level resolution branches: segment abs vs " +
      "delta, both clamps, INTRA ref delta, B_PRED mode delta") {
    def lvl(frame: Int, seg: Boolean = false, abs: Boolean = false,
        segV: Int = 0, lfd: Boolean = false, refD: Int = 0,
        modeD: Int = 0, bpred: Boolean = false): Int =
      Vp8.mbFilterLevel(frame, seg, abs, segV, lfd, refD, modeD, bpred)
    assert(lvl(20) == 20)
    // segment ABSOLUTE replaces the frame level; DELTA adds to it
    assert(lvl(20, seg = true, abs = true, segV = 5) == 5)
    assert(lvl(20, seg = true, segV = 5) == 25)
    // clamps at both stages
    assert(lvl(60, seg = true, segV = 10) == 63)
    assert(lvl(10, seg = true, segV = -30) == 0)
    assert(lvl(60, lfd = true, refD = 10) == 63)
    assert(lvl(10, lfd = true, refD = -30) == 0)
    // the INTRA ref delta applies to every key-frame MB; the mode
    // delta ONLY to B_PRED macroblocks
    assert(lvl(20, lfd = true, refD = 6) == 26)
    assert(lvl(20, lfd = true, refD = 6, modeD = 4) == 26)
    assert(lvl(20, lfd = true, refD = 6, modeD = 4, bpred = true) == 30)
    // deltas stack on the CLAMPED segment base (63 - 10 = 53)
    assert(lvl(60, seg = true, segV = 10, lfd = true, refD = -10) == 53)
  }

  test("segmentation end-to-end: the real segment-map decode feeds " +
      "per-segment ABSOLUTE loop-filter levels — a level-0 segment " +
      "vetoes its MB's edges, a level-14 segment reproduces the " +
      "hand-computed profile") {
    // frame-level 5 only opens the pass; ABS segment levels decide
    def grid(ids: Array[Int]) = Vp8.decodeFrame(Vp8.encodeDcGrid(32, 16,
      Array(124, -132), Array(0, 0), Array(0, 0), 0, 0, 5, 0,
      segLfAbs = Array(0, 14, 0, 0), segIds = ids))
    // MB1 (the MB that owns the step edge) in segment 0 (lf 0): raw step
    val vetoed = grid(Array(1, 0))
    assert(vetoed.y(15) == 144 && vetoed.y(16) == 128,
      "segment-0 veto failed: the edge was filtered")
    // MB1 in segment 1 (lf 14): exactly the level-14 wide-tap profile
    val filtered = grid(Array(0, 1))
    val yRow = Seq.fill(13)(144) ++ Seq(142, 139, 137, 135, 133, 130) ++
      Seq.fill(13)(128)
    for (r <- 0 until 16; c <- 0 until 32)
      assert(filtered.y(r * filtered.yStride + c) == yRow(c), s"Y($r,$c)")
  }

  test("loop filter grid fixture round-trips unfiltered at level 0 " +
      "(DC prediction propagates left-to-right through the grid)") {
    val f = Vp8.decodeFrame(Vp8.encodeDcGrid(48, 32,
      Array(124, -132, 0, 0, 124, 0), Array.fill(6)(0), Array.fill(6)(0),
      0, 0, 0, 0))
    // row 0 of MBs: 144 | 128 | 128; row 1 (DC pred = above): +16 → 160 | (160+128+... )
    for (c <- 0 until 16) assert(f.y(c) == 144, s"MB00 col $c")
    for (c <- 16 until 48) assert(f.y(c) == 128, s"top row col $c")
  }
}
