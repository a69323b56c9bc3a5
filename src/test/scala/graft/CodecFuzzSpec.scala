package graft

import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Garbage-tolerance contract for every byte-level decoder: a crawl-scale
 * corpus WILL contain truncated, bit-flipped and adversarial payloads,
 * and a 1000-executor job must fail them with the codecs' NAMED errors
 * (IllegalArgumentException / UnsupportedOperationException), never with
 * raw AIOOBE/NPE/negative-size crashes or hangs that kill tasks with
 * undiagnosable stack traces. Two attack shapes per decoder: random
 * bytes behind a valid magic prefix, and valid payloads with a few
 * random byte mutations (the realistic bit-rot/truncation shape).
 */
class CodecFuzzSpec extends AnyFunSuite {

  private val Trials = 200 // an 800-trial pass ran clean at authoring time

  /** Run one decode attempt; only named errors (or success) allowed. */
  private def attempt(tag: String, seed: Long)(body: => Any): Unit =
    try { body; () } catch {
      case _: IllegalArgumentException => () // named rejection
      case _: UnsupportedOperationException => () // named seam
      case e: Throwable =>
        fail(s"$tag seed $seed: un-named ${e.getClass.getSimpleName}: " +
          s"${String.valueOf(e.getMessage).take(120)}")
    }

  private def mutate(valid: Array[Byte], rnd: scala.util.Random,
      nFlips: Int): Array[Byte] = {
    val p = valid.clone()
    var i = 0
    while (i < nFlips) {
      p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      i += 1
    }
    if (rnd.nextBoolean() && p.length > 8)
      java.util.Arrays.copyOf(p, 8 + rnd.nextInt(p.length - 8))
    else p
  }

  test("Vp8.decodeFrame: random and mutated key frames fail NAMED") {
    val rnd = new scala.util.Random(0xF0221)
    val valid = Vp8.encodeSolid(32, 32, 9, 3, -3, 0)
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(6))
        else {
          val r = new Array[Byte](10 + rnd.nextInt(200))
          rnd.nextBytes(r)
          // valid tag + start code so the fuzz reaches the bool stream
          r(0) = (r(0) & 0xFE).toByte
          r(3) = 0x9D.toByte; r(4) = 0x01; r(5) = 0x2A
          r
        }
      attempt("vp8", t)(Vp8.decodeFrame(p))
    }
  }

  test("Webp.decodeWebp: random and mutated containers fail NAMED") {
    val rnd = new scala.util.Random(0xF0222)
    val valid = Webp.encodeWebpLossless(4, 3, Array.fill(12)(0xFF336699))
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          val r = new Array[Byte](20 + rnd.nextInt(300))
          rnd.nextBytes(r)
          System.arraycopy("RIFF".getBytes, 0, r, 0, 4)
          System.arraycopy("WEBP".getBytes, 0, r, 8, 4)
          r
        }
      attempt("webp", t)(Webp.decodeWebp(p))
    }
  }

  test("Webp.decodeWebp lossy+ALPH: mutated alpha containers fail NAMED " +
      "(both raw and VP8L-compressed alpha bodies)") {
    val rnd = new scala.util.Random(0xF0226)
    val frame = Vp8.encodeSolid(16, 16, 4, 0, 0, 0)
    val target = Array.tabulate(256)(i => (i * 3) % 256)
    val seeds = (0 to 3).flatMap { filt =>
      Seq(0, 1).map { comp =>
        val (head, body) = Webp.encodeAlph(16, 16, target, filt, comp)
        Webp.lossyAlphaWrap(16, 16, frame, head, body)
      }
    }
    for (t <- 0 until Trials)
      attempt("webp-alph", t)(Webp.decodeWebp(
        mutate(seeds(t % seeds.length), rnd, 1 + rnd.nextInt(5))))
  }

  test("Pdf.extractText: random and mutated documents fail NAMED") {
    val rnd = new scala.util.Random(0xF022A)
    val valid = operators.Pdf.encodePdf(
      Seq("page one text (with) escapes \\ here", "page two"),
      title = "Fuzz Doc")
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(6))
        else {
          val r = new Array[Byte](16 + rnd.nextInt(400))
          rnd.nextBytes(r)
          System.arraycopy("%PDF-1.4\n".getBytes, 0, r, 0, 9)
          r
        }
      attempt("pdf", t)(operators.Pdf.extractText(p))
    }
  }

  test("Mp3: meta walk and decode on random/mutated streams fail NAMED") {
    val rnd = new scala.util.Random(0xF0223)
    val valid = Mp3.encodeMp3Silence(7L, 9, nFrames = 2)
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          val r = new Array[Byte](8 + rnd.nextInt(400))
          rnd.nextBytes(r)
          r(0) = 0xFF.toByte; r(1) = (r(1) | 0xE0).toByte // frame sync
          r
        }
      attempt("mp3meta", t)(Mp3.mp3Meta(p))
      attempt("mp3dec", t)(Mp3.decodeMp3(p))
    }
  }

  test("Mp3.id3TextFrames: random and mutated tags fail NAMED") {
    val rnd = new scala.util.Random(0xF0229)
    val valid = Mp3.encodeMp3Tagged(Mp3.encodeId3v2(Seq(
      "TIT2" -> "A Title", "TPE1" -> "Someone", "TALB" -> "The Album"),
      version = 4, enc = 1, pad = 11), Seq(64))
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          val r = new Array[Byte](10 + rnd.nextInt(300))
          rnd.nextBytes(r)
          r(0) = 'I'; r(1) = 'D'; r(2) = '3' // tag magic, random guts
          r
        }
      attempt("id3", t)(Mp3.id3TextFrames(p))
    }
  }

  test("Multimodal.pngTextChunks: random and mutated text chunks fail NAMED") {
    val rnd = new scala.util.Random(0xF022B)
    val valid = Multimodal.Png.encodePngWithText(4, 4,
      Array.tabulate(48)(i => (i * 5).toByte),
      Seq(("Title", "A Doc", 0), ("Author", "Someone", 1),
        ("Comment", "note", 3)))
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          val r = new Array[Byte](12 + rnd.nextInt(300))
          rnd.nextBytes(r)
          System.arraycopy(valid, 0, r, 0, 8) // PNG signature
          r
        }
      attempt("pngtext", t)(Multimodal.Png.pngTextChunks(p))
    }
  }

  test("Exif.exifMeta: random and mutated APP1 blocks fail NAMED") {
    val rnd = new scala.util.Random(0xF022A)
    val jpeg = Jpeg.encodeGray(8, 8, Array.tabulate(64)(i => (i * 5).toByte))
    val valid = Exif.withExif(jpeg, 6, "graft-cam", "M-1",
      "2026:01:05 12:00:00", 4032, 3024, bigEndian = true)
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          val r = new Array[Byte](12 + rnd.nextInt(300))
          rnd.nextBytes(r)
          r(0) = 0xFF.toByte; r(1) = 0xD8.toByte // SOI, random segments
          r
        }
      attempt("exif", t)(Exif.exifMeta(p))
    }
  }

  test("Warc.parseWarc: random and mutated archives fail NAMED") {
    val rnd = new scala.util.Random(0xF0224)
    val html = "<p>fuzz fixture body</p>"
    val valid = {
      import org.apache.spark.sql.functions._
      // build one real warc.gz via the same writer the queries use
      val spark = SparkTestSession.get
      import spark.implicits._
      Warc.withWarcGzPayload(
          Seq((1L, html, "https://x.test/1")).toDF("id", "html", "uri"),
          "html", "uri")
        .select("payload").as[Array[Byte]].head()
    }
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(4))
        else {
          val r = new Array[Byte](12 + rnd.nextInt(300))
          rnd.nextBytes(r)
          System.arraycopy("WARC/1.0\r\n".getBytes, 0, r, 0, 10)
          r
        }
      attempt("warc", t)(Warc.parseWarc(p))
    }
  }

  test("Warc.parseHttp: random and mutated CHUNKED responses fail NAMED") {
    val rnd = new scala.util.Random(0xF0227)
    val body = Array.tabulate(97)(i => (i * 7 + 1).toByte)
    val valid = Warc.httpResponseBytes(body, "application/octet-stream",
      chunkSize = 13)
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(5))
        else {
          // random chunk framing behind a real chunked header
          val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            .getBytes
          val r = new Array[Byte](head.length + rnd.nextInt(200))
          rnd.nextBytes(r)
          System.arraycopy(head, 0, r, 0, head.length)
          r
        }
      attempt("chunked", t)(Warc.parseHttp(p))
    }
  }

  test("text parsers (Html extract/main/tables, Robots, Sitemap, Urls): " +
      "random text never throws at all") {
    val rnd = new scala.util.Random(0xF0225)
    val alphabet = "<>&;/=\"' abcdefATUDPSnr-:#?%0123 😀!"
    for (t <- 0 until Trials) {
      val s = Array.fill(rnd.nextInt(400))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // total functions: garbage text is still text
      Html.extractText(s); Html.mainContent(s); Html.extractTables(s)
      Robots.decide(Robots.parse(s), "anybot", "/" + s.take(40))
      Sitemap.parse(s)
      Urls.canonicalizeUrl(s.take(100))
    }
  }

  test("legacy image codecs (PNG/JPEG/GIF/TIFF/BMP): random and mutated " +
      "payloads fail NAMED through SniffCodec") {
    val rnd = new scala.util.Random(0xF0227)
    val rgb = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 17 + 3).toByte)
    val valids = Seq[(String, Array[Byte])](
      ("png", Multimodal.Png.encodePng(4, 3, rgb)),
      ("jpeg", Jpeg.encodeRgb(4, 3, rgb)),
      ("gif", Gif.encodeGif(2, 2, Array[Byte](0, 1, 2, 3),
        Array.tabulate[Byte](12)(i => (i * 9).toByte))),
      ("tiff", Tiff.encodeTiff(4, 3, rgb, channels = 3)),
      ("bmp", Multimodal.Containers.encodeBmp(4, 3, rgb)))
    for ((tag, valid) <- valids; t <- 0 until Trials) {
      attempt(tag, t)(
        Multimodal.SniffCodec.decodeImage(mutate(valid, rnd,
          1 + rnd.nextInt(5))))
      // random tails behind the real magic
      val r = new Array[Byte](16 + rnd.nextInt(200))
      rnd.nextBytes(r)
      System.arraycopy(valid, 0, r, 0, math.min(8, valid.length))
      attempt(tag + "-rand", t)(Multimodal.SniffCodec.decodeImage(r))
    }
  }

  test("audio codecs (WAV/ADPCM): random and mutated payloads fail NAMED") {
    val rnd = new scala.util.Random(0xF0228)
    val samples = Array.tabulate[Short](64)(i => (i * 331 - 9000).toShort)
    val valids = Seq[(String, Array[Byte])](
      ("wav", Multimodal.Containers.encodeWav(8000, samples)),
      ("adpcm", Adpcm.encodeAdpcmWav(8000, samples)))
    for ((tag, valid) <- valids; t <- 0 until Trials) {
      attempt(tag, t)(
        Multimodal.SniffCodec.decodeAudio(mutate(valid, rnd,
          1 + rnd.nextInt(4))))
      val r = new Array[Byte](16 + rnd.nextInt(200))
      rnd.nextBytes(r)
      System.arraycopy(valid, 0, r, 0, 12) // RIFF....WAVE
      attempt(tag + "-rand", t)(Multimodal.SniffCodec.decodeAudio(r))
    }
  }

  test("animated frame decoders (GIF frames, animated WebP, AVI): " +
      "random and mutated payloads fail NAMED") {
    val rnd = new scala.util.Random(0xF0229)
    val gifAnim = Gif.encodeAnimatedGif(4, 2,
      Array.tabulate[Byte](8 * 3)(i => (i * 9 + 2).toByte), bgIndex = 0,
      Seq(Gif.Frame(0, 0, 4, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)),
        Gif.Frame(1, 0, 2, 1, Array[Byte](0, 7), disposal = 2)))
    val webpAnim = {
      def px(i: Int) = 0xFF000000 | (i * 0x10203)
      Webp.encodeAnimatedWebp(4, 2, Seq(
        Webp.Frame(0, 0, 4, 2, Array.tabulate(8)(px)),
        Webp.Frame(2, 0, 2, 1, Array.tabulate(2)(px), blend = true,
          disposeBg = true)))
    }
    val valids = Seq[(String, Array[Byte] => Any, Array[Byte])](
      ("gif-frames", Gif.decodeGifFrames(_), gifAnim),
      ("webp-frames", Webp.decodeWebpFrames(_), webpAnim))
    for ((tag, dec, valid) <- valids; t <- 0 until Trials) {
      attempt(tag, t)(dec(mutate(valid, rnd, 1 + rnd.nextInt(4))))
      val r = new Array[Byte](16 + rnd.nextInt(200))
      rnd.nextBytes(r)
      System.arraycopy(valid, 0, r, 0, math.min(12, valid.length))
      attempt(tag + "-rand", t)(dec(r))
    }
  }

  test("WasmBinary.decode: random and mutated modules fail NAMED") {
    val rnd = new scala.util.Random(0xF0226)
    val valid = graft.wasm.LensGuestModules.shiftGuest("n")
    for (t <- 0 until Trials) {
      val p =
        if (t % 2 == 0) mutate(valid, rnd, 1 + rnd.nextInt(4))
        else {
          val r = new Array[Byte](8 + rnd.nextInt(300))
          rnd.nextBytes(r)
          r(0) = 0; r(1) = 'a'; r(2) = 's'; r(3) = 'm'
          r(4) = 1; r(5) = 0; r(6) = 0; r(7) = 0
          r
        }
      try { graft.wasm.WasmBinary.decode(p); () } catch {
        case _: graft.wasm.WasmDecodeError => ()
        case e: Throwable =>
          fail(s"wasm seed $t: un-named ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(120)}")
      }
    }
  }

  test("WasmInterp: mutated modules that DECODE also load/EXECUTE with " +
      "named outcomes only — WasmValidate rejects type-broken mutants at " +
      "instantiation (a WasmValidateError IS a WasmDecodeError), fuel " +
      "bounds runaway loops; a raw index error from a validated module " +
      "now fails this contract as an ENGINE bug instead of being renamed") {
    val rnd = new scala.util.Random(0xF0228)
    // rotate across the guest matrix: different control-flow/table/
    // state shapes exercise different validator paths (a 4000-trial
    // multi-seed pass ran clean at r15 authoring: 0 un-named escapes,
    // 239 type-broken mutants caught by validation pre-execution)
    val seeds = Seq(
      graft.wasm.LensGuestModules.shiftGuest("n"),
      graft.wasm.LensGuestModules.filterGuest("n"),
      graft.wasm.LensGuestModules.repeatGuest(),
      graft.wasm.LensGuestModules.renameGuest("a", "b"))
    val next = Map(("lens", "next") ->
      ((_: Vector[Long]) => Vector(0L)))
    var executed = 0
    for (t <- 0 until Trials) {
      val p = mutate(seeds(t % seeds.length), rnd, 1 + rnd.nextInt(6))
      try {
        val m = graft.wasm.WasmBinary.decode(p)
        val inst = new graft.wasm.WasmInterp.Instance(m, next,
          stepBudget = 50000)
        if (inst.hasExport("transform")) { inst.invoke("transform"); () }
        executed += 1
      } catch {
        case _: graft.wasm.WasmDecodeError => ()
        case _: graft.wasm.WasmTrap => executed += 1
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"wasm-exec seed $t: un-named ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(executed > 0, "fixture drifted: no mutant reached execution")
  }
}
