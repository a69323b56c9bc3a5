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

  test("webp container round-trip routes the lossy chunk through Vp8") {
    val webp = Vp8.webpWrap(Vp8.encodeSolid(16, 16, 4, 0, 0, 0))
    val (w, h, ch, fmt, px) = graft.operators.Webp.decodeWebp(webp)
    assert((w, h, ch, fmt) == (16, 16, 3, "yuv420"))
    assert(math.round(px(0) * 255) == Vp8.solidY(4, 0))
    // lossy + ALPH is a NAMED tier: the alpha plane must never be
    // silently dropped. Splice an ALPH chunk before the VP8 chunk.
    val frame = Vp8.encodeSolid(16, 16, 4, 0, 0, 0)
    val alph = Array[Byte]('A', 'L', 'P', 'H', 2, 0, 0, 0, 0, 0)
    val bb = java.nio.ByteBuffer
      .allocate(12 + alph.length + 8 + frame.length + (frame.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + alph.length + 8 + frame.length + (frame.length & 1))
      .put("WEBP".getBytes("US-ASCII"))
      .put(alph)
      .put("VP8 ".getBytes("US-ASCII")).putInt(frame.length).put(frame)
    if ((frame.length & 1) == 1) bb.put(0.toByte)
    val eA = intercept[IllegalArgumentException](
      graft.operators.Webp.decodeWebp(bb.array()))
    assert(eA.getMessage.contains("ALPH"), eA.getMessage)
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

  test("named failures: interframe, nonzero loop filter, truncation, " +
      "bad start code") {
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
    // a frame with filter level 5: flip the 6-bit level field is deep in
    // the bool stream, so build one via a doctored encoder run instead:
    // re-encode with the same layout but nonzero level
    val enc = new Vp8.BoolEnc
    enc.literal(0, 1); enc.literal(0, 1); enc.bool(0, 128)
    enc.literal(0, 1); enc.literal(5, 6); enc.literal(0, 3)
    val part1 = enc.toBytes
    val out = new java.io.ByteArrayOutputStream()
    val tag = (part1.length << 5) | (1 << 4)
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
    out.write((tag >> 16) & 0xFF)
    out.write(0x9D); out.write(0x01); out.write(0x2A)
    out.write(16); out.write(0); out.write(16); out.write(0)
    out.write(part1, 0, part1.length)
    val eL = intercept[IllegalArgumentException](
      Vp8.decodeFrame(out.toByteArray))
    assert(eL.getMessage.contains("loop filter"))
  }
}
