package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Multimodal-column operators: treat image/audio/video as opaque `binary`
 * columns plus a typed metadata struct, and run decode / feature-extract /
 * resize / frame-sample as batched partition-local transforms.
 *
 * Execution model (the 100 TB design): payloads never leave their input
 * split — every op here is `mapPartitions` over an explicit micro-batch
 * iterator (`BatchSize` rows at a time, the JVM analogue of a vectorized
 * Pandas-UDF batch): no shuffle, no driver collect, memory bounded by
 * batch × payload size regardless of partition row count. Downstream
 * relational work happens on the *small* decoded columns (meta, features),
 * never on the payload bytes, so later shuffles move KBs not media blobs.
 *
 * Codec note: real image/audio decoders are not available in this
 * environment, so `Codec` is STUBBED with a deterministic fake
 * (`FakeCodec`) that derives pixel/sample tensors from the payload bytes.
 * The Spark-side plumbing — schema, batch shape, partitioning, operator
 * signatures — is real and is what these ops test; swap `FakeCodec` for a
 * JNI/javax.imageio-backed `Codec` in production.
 *
 * The reference (sourcenetwork/lens) streams opaque JSON documents and
 * leaves interpretation to user WASM (reference:
 * host-go/engine/pipes/fromSource.go:37-145); these north-star ops give
 * that role first-class, schema-typed operators instead.
 */
object Multimodal {

  /** Rows per decode batch — the `mapInPandas` batch-size analogue. */
  val BatchSize = 64

  /** Decoded-image schema appended by `decodeImage`. */
  val ImageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  // ------------------------------------------------------------------ codec

  /** Decoder contract. Production implementations wrap a real library;
   *  `FakeCodec` below is the deterministic STUB used in this container. */
  trait Codec extends Serializable {
    /** payload → (width, height, channels, format, rowMajor pixels[h*w*c] in [0,1]). */
    def decodeImage(payload: Array[Byte]): (Int, Int, Int, String, Array[Float])
    /** payload → (sampleRate, mono samples in [-1,1]). */
    def decodeAudio(payload: Array[Byte]): (Int, Array[Float])
  }

  /**
   * STUB — deterministic fake decode (no media libraries in-container).
   * Dimensions derive from payload length, pixels/samples from payload
   * bytes, so every run and every engine agrees on the output and specs
   * can assert exact values.
   */
  object FakeCodec extends Codec {
    def imageDims(nBytes: Int): (Int, Int, Int) =
      (8 + nBytes % 24, 8 + (nBytes / 7) % 24, 3)

    /** Empty/null payloads read as a single zero byte for the pixel/sample
     *  fill — a deterministic stand-in instead of a task-killing division
     *  by zero. Dimensions still derive from the TRUE byte length (0), so
     *  the byte-arithmetic oracle contract is unchanged. */
    private def nonEmpty(p: Array[Byte]): Array[Byte] =
      if (p == null || p.isEmpty) Array[Byte](0) else p

    private def trueLen(p: Array[Byte]): Int = if (p == null) 0 else p.length

    override def decodeImage(p0: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
      val p = nonEmpty(p0)
      val (w, h, c) = imageDims(trueLen(p0))
      val px = new Array[Float](w * h * c)
      var i = 0
      while (i < px.length) {
        px(i) = ((p(i % p.length) & 0xff) ^ (i & 0xff)) / 255.0f
        i += 1
      }
      (w, h, c, "fake", px)
    }

    override def decodeAudio(p0: Array[Byte]): (Int, Array[Float]) = {
      val p = nonEmpty(p0)
      val n = 256 + (trueLen(p0) % 1024)
      val samples = Array.tabulate(n)(i => ((p(i % p.length) & 0xff) - 128) / 128.0f)
      (16000, samples)
    }
  }

  /**
   * Real container codecs — NO media libraries required: BMP (24-bit
   * uncompressed BI_RGB) and WAV (PCM16) are pure byte-layout container
   * formats, so their decode is integer arithmetic over the payload,
   * exactly what this container can do honestly. Encoders included so
   * sinks/specs can round-trip golden payloads. Compressed formats with
   * REAL codecs now too: [[Png]] (JDK zlib + filter reconstruction) and
   * [[Jpeg]] (baseline huffman+DCT, decoder and encoder). MP3/H.264
   * stay behind the [[Codec]] seam as the documented production plug-in.
   */
  object Containers {

    // private[operators]: Gif and Adpcm share these (one copy of the
    // byte-order helpers, no drift surface)
    private[operators] def le16(b: Array[Byte], at: Int): Int =
      (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8)
    private[operators] def le32(b: Array[Byte], at: Int): Int =
      (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
        ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
    private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
    }
    private def w32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
      o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
    }

    /** Write h·w·3 top-down RGB bytes as DIB pixel rows: bottom-up,
     *  BGR, 4-byte padded — the ONE copy of the layout both the BMP
     *  encoder and the AVI frame writer share. */
    private[Multimodal] def packDibRows(w: Int, h: Int, rgb: Array[Byte],
        o: java.io.ByteArrayOutputStream): Unit = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          o.write(rgb(i + 2)); o.write(rgb(i + 1)); o.write(rgb(i))
          x += 1
        }
        var pad = rowSize - w * 3
        while (pad > 0) { o.write(0); pad -= 1 }
        y -= 1
      }
    }

    /** Read DIB pixel rows back to row-major top-down RGB floats —
     *  the shared inverse of [[packDibRows]]. */
    private[Multimodal] def unpackDibRows(p: Array[Byte], off: Int,
        w: Int, h: Int, bottomUp: Boolean): Array[Float] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val px = new Array[Float](w * h * 3)
      var y = 0
      while (y < h) {
        val src = off + (if (bottomUp) h - 1 - y else y) * rowSize
        var x = 0
        while (x < w) {
          val d = (y * w + x) * 3
          px(d) = (p(src + x * 3 + 2) & 0xFF) / 255.0f
          px(d + 1) = (p(src + x * 3 + 1) & 0xFF) / 255.0f
          px(d + 2) = (p(src + x * 3) & 0xFF) / 255.0f
          x += 1
        }
        y += 1
      }
      px
    }

    def isBmp(p: Array[Byte]): Boolean =
      p != null && p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte
    def isWav(p: Array[Byte]): Boolean =
      p != null && p.length >= 44 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    /** 24-bit BI_RGB BMP from row-major top-down RGB bytes (h·w·3). */
    def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb.length == w * h * 3,
        s"need w*h*3 = ${w * h * 3} RGB bytes, got ${rgb.length}")
      val rowSize = ((w * 3 + 3) / 4) * 4
      val o = new java.io.ByteArrayOutputStream(54 + rowSize * h)
      o.write('B'); o.write('M'); w32(o, 54 + rowSize * h)
      w32(o, 0); w32(o, 54) // reserved, pixel offset
      w32(o, 40); w32(o, w); w32(o, h) // BITMAPINFOHEADER, bottom-up
      w16(o, 1); w16(o, 24); w32(o, 0) // planes, bpp, BI_RGB
      w32(o, rowSize * h); w32(o, 2835); w32(o, 2835); w32(o, 0); w32(o, 0)
      packDibRows(w, h, rgb, o)
      o.toByteArray
    }

    /** (width, height, 3, "bmp", row-major top-down RGB floats in [0,1]).
     *  Accepts bottom-up (positive height) and top-down (negative)
     *  24-bpp uncompressed payloads. */
    def decodeBmp(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
      require(isBmp(p), "not a BMP payload")
      val offBits = le32(p, 10)
      val w = le32(p, 18)
      val hRaw = le32(p, 22)
      val bottomUp = hRaw > 0
      val h = math.abs(hRaw)
      // dims validated BEFORE any size arithmetic: a negative/huge header
      // value must fail loudly here, not overflow the Int bounds check
      // into a deep NegativeArraySize crash (same discipline as the
      // WAV/AVI chunk walks)
      require(w > 0 && h > 0 && hRaw != Int.MinValue,
        s"bad BMP dimensions ${w}x$hRaw")
      require(w.toLong * h <= (1L << 26),
        s"implausible BMP dimensions ${w}x$h (cap 2^26 pixels)")
      require(le16(p, 26) == 1 && le16(p, 28) == 24 && le32(p, 30) == 0,
        "only 24-bpp uncompressed BI_RGB is supported")
      val rowSize = ((w.toLong * 3 + 3) / 4) * 4
      require(offBits >= 54 &&
        offBits.toLong + rowSize * h <= p.length.toLong,
        "truncated BMP pixel data")
      require(w.toLong * h * 3 <= Int.MaxValue, "BMP too large to decode")
      val px = unpackDibRows(p, offBits, w, h, bottomUp)
      (w, h, 3, "bmp", px)
    }

    /** Mono PCM16 WAV. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, "sampleRate must be positive")
      val dataLen = samples.length * 2
      val o = new java.io.ByteArrayOutputStream(44 + dataLen)
      o.write('R'); o.write('I'); o.write('F'); o.write('F')
      w32(o, 36 + dataLen)
      o.write('W'); o.write('A'); o.write('V'); o.write('E')
      o.write('f'); o.write('m'); o.write('t'); o.write(' ')
      w32(o, 16); w16(o, 1); w16(o, 1) // PCM, mono
      w32(o, sampleRate); w32(o, sampleRate * 2); w16(o, 2); w16(o, 16)
      o.write('d'); o.write('a'); o.write('t'); o.write('a'); w32(o, dataLen)
      samples.foreach(s => w16(o, s & 0xFFFF))
      o.toByteArray
    }

    /** (sampleRate, mono samples in [-1,1]) from a PCM16 WAV of any
     *  channel count (channels average to mono). Walks the RIFF chunk
     *  list (even-aligned), so fmt/data order and extra chunks (LIST,
     *  fact) are a writer's choice. */
    def decodeWav(p: Array[Byte]): (Int, Array[Float]) = {
      require(isWav(p), "not a WAV payload")
      var at = 12
      var rate = 0; var ch = 0; var ok = false
      var dataAt = -1; var dataLen = 0
      while (at + 8 <= p.length) {
        val id = new String(p, at, 4, "US-ASCII")
        val size = le32(p, at + 4)
        require(size >= 0 && at + 8 + size.toLong <= p.length,
          s"truncated WAV chunk '$id' at $at (size $size)")
        if (id == "fmt ") {
          require(size >= 16, s"fmt chunk too short: $size")
          require(le16(p, at + 8) == 1, "only PCM WAV is supported")
          ch = le16(p, at + 10); rate = le32(p, at + 12)
          require(le16(p, at + 22) == 16, "only 16-bit PCM is supported")
          ok = true
        } else if (id == "data") { dataAt = at + 8; dataLen = size }
        at += 8 + size + (size & 1) // RIFF chunks are even-aligned
      }
      require(ok && dataAt >= 0 && ch > 0, "WAV missing fmt/data chunk")
      require(dataAt + dataLen.toLong <= p.length, "truncated WAV data chunk")
      val n = dataLen / (2 * ch)
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        var sum = 0
        var c = 0
        while (c < ch) {
          val at2 = dataAt + (i * ch + c) * 2
          sum += (le16(p, at2) << 16) >> 16 // sign-extend
          c += 1
        }
        out(i) = sum / (32768.0f * ch)
        i += 1
      }
      (rate, out)
    }
  }

  /** AVI extensions to [[Containers]]: uncompressed-DIB video — the
   *  third real container (image=BMP, audio=WAV, video=AVI), still pure
   *  byte arithmetic. Frames are stored exactly like BMP pixel data
   *  (bottom-up, BGR, 4-byte row padding) inside `00db` chunks of the
   *  `movi` LIST; dimensions/frame-count live in the `avih` header. */
  object Avi {
    import Containers.le32

    def isAvi(p: Array[Byte]): Boolean =
      p != null && p.length >= 24 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

    /** Minimal-but-real AVI-with-DIB writer: RIFF('AVI ') { LIST(hdrl)
     *  { avih, LIST(strl){strh,strf} }, LIST(movi){ 00db×frames } }.
     *  Each frame is row-major top-down RGB (w·h·3 bytes). */
    def encodeAvi(w: Int, h: Int, fps: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty, "empty video")
      frames.foreach(f => require(f.length == w * h * 3,
        s"each frame needs w*h*3 = ${w * h * 3} RGB bytes"))
      val rowSize = ((w * 3 + 3) / 4) * 4
      def dib(rgb: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream(rowSize * h)
        Containers.packDibRows(w, h, rgb, o) // ONE copy of the DIB layout
        o.toByteArray
      }
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream(8 + body.length + 1)
        id.getBytes("US-ASCII").foreach(o.write(_))
        o.write(body.length & 0xFF); o.write((body.length >> 8) & 0xFF)
        o.write((body.length >> 16) & 0xFF); o.write((body.length >> 24) & 0xFF)
        o.write(body, 0, body.length)
        if ((body.length & 1) == 1) o.write(0) // even alignment
        o.toByteArray
      }
      def list(subtype: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", subtype.getBytes("US-ASCII") ++ body)
      def i32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      val avih = chunk("avih",
        i32(1000000 / fps) ++ i32(0) ++ i32(0) ++ i32(0) ++
          i32(frames.length) ++ i32(0) ++ i32(1) ++ i32(0) ++
          i32(w) ++ i32(h) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0))
      val strh = chunk("strh",
        "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
          i32(0) ++ i32(0) ++ i32(0) ++
          i32(1) ++ i32(fps) ++ i32(0) ++ i32(frames.length) ++
          i32(rowSize * h) ++ i32(-1) ++ i32(0) ++ i32(0) ++ i32(0))
      val strf = chunk("strf", // BITMAPINFOHEADER
        i32(40) ++ i32(w) ++ i32(h) ++ Array[Byte](1, 0, 24, 0) ++ i32(0) ++
          i32(rowSize * h) ++ i32(2835) ++ i32(2835) ++ i32(0) ++ i32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi",
        frames.flatMap(f => chunk("00db", dib(f))).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      val o = new java.io.ByteArrayOutputStream(body.length + 8)
      "RIFF".getBytes("US-ASCII").foreach(o.write(_))
      o.write(body.length & 0xFF); o.write((body.length >> 8) & 0xFF)
      o.write((body.length >> 16) & 0xFF); o.write((body.length >> 24) & 0xFF)
      o.write(body, 0, body.length)
      o.toByteArray
    }

    /** (width, height, frames as row-major top-down RGB floats). Walks
     *  the RIFF tree (chunk order / extra chunks are a writer's choice);
     *  accepts `00db`/`00dc` frame chunks of uncompressed 24-bpp DIBs. */
    def decodeAvi(p: Array[Byte]): (Int, Int, Seq[Array[Float]]) = {
      require(isAvi(p), "not an AVI payload")
      var w = 0; var h = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(at0: Int, end: Int): Unit = {
        var at = at0
        while (at + 8 <= end) {
          val id = new String(p, at, 4, "US-ASCII")
          val size = le32(p, at + 4)
          // loud on truncation: copyOfRange would silently zero-pad a
          // chunk whose declared size runs past the payload
          require(size >= 0 && at + 8 + size.toLong <= end,
            s"truncated AVI chunk '$id' at $at (size $size, end $end)")
          if (id == "LIST") walk(at + 12, at + 8 + size)
          else if (id == "avih") {
            require(size >= 40, s"avih chunk too short: $size")
            w = le32(p, at + 40); h = le32(p, at + 44)
          }
          else if (id == "00db" || id == "00dc")
            frames += java.util.Arrays.copyOfRange(p, at + 8, at + 8 + size)
          at += 8 + size + (size & 1)
        }
      }
      walk(12, p.length)
      require(w > 0 && h > 0 && frames.nonEmpty, "AVI missing avih/frames")
      val rowSize = ((w * 3 + 3) / 4) * 4
      val out = frames.map { dib =>
        require(dib.length >= rowSize.toLong * h, "truncated DIB frame")
        Containers.unpackDibRows(dib, 0, w, h, bottomUp = true)
      }
      (w, h, out.toSeq)
    }
  }

  /** Real PNG codec — the first COMPRESSED format with a real decode
   *  path (BMP/WAV/AVI are pure byte layouts): zlib ships in the JDK
   *  (`java.util.zip.Inflater`/`Deflater`), so IDAT decompression plus
   *  the PNG filter reconstruction (None/Sub/Up/Average/Paeth, RFC 2083
   *  §6) is implementable offline with no media library. Supports
   *  grayscale (color type 0), truecolor (2), gray+alpha (4, expanded
   *  to RGBA) and truecolor+alpha (6) at bit depth 8 AND 16 (big-endian
   *  samples normalized v/65535), and PALETTE (3) at bit depth 1/2/4/8
   *  (PLTE lookup, optional tRNS → RGBA) — each in BOTH interlace
   *  methods (none and Adam7 seven-pass). Every chunk CRC is verified
   *  so corrupt payloads fail loudly at the chunk that broke, never as
   *  garbage pixels.
   *
   *  100 TB shape: decode is partition-local per payload (the
   *  [[decodeImage]] mapPartitions batch loop); memory is one inflated
   *  scanline buffer per image, no shuffle, blobs never move. */
  object Png {

    private val Sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def isPng(p: Array[Byte]): Boolean =
      p != null && p.length >= 8 && {
        var i = 0
        while (i < 8 && p(i) == Sig(i)) i += 1
        i == 8
      }

    private def be32(b: Array[Byte], at: Int): Int =
      ((b(at) & 0xFF) << 24) | ((b(at + 1) & 0xFF) << 16) |
        ((b(at + 2) & 0xFF) << 8) | (b(at + 3) & 0xFF)

    private def crc(b: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32()
      c.update(b, off, len)
      c.getValue.toInt
    }

    private def deflateRaw(raw: Array[Byte]): Array[Byte] = {
      val defl = graft.operators.ZlibPool.zlibDeflater() // reused, reset —
      defl.setInput(raw); defl.finish()                  // identical bytes
      val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = graft.operators.ZlibPool.scratch()
      while (!defl.finished()) zBuf.write(tmp, 0, defl.deflate(tmp))
      zBuf.toByteArray
    }

    /** Sig + IHDR + extra chunks + IDAT + IEND, CRCs computed. */
    private def assemblePng(w: Int, h: Int, bitDepth: Int, colorType: Int,
        interlace: Int, extra: Seq[(String, Array[Byte])],
        idatz: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(idatz.length + 128)
      o.write(Sig, 0, 8)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        def b32(v: Int): Unit = {
          o.write((v >> 24) & 0xFF); o.write((v >> 16) & 0xFF)
          o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
        }
        val body = typ.getBytes("US-ASCII") ++ data
        b32(data.length); o.write(body, 0, body.length)
        b32(crc(body, 0, body.length))
      }
      val ihdr = new Array[Byte](13)
      ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
      ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
      ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
      ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
      ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
      ihdr(12) = interlace.toByte
      chunk("IHDR", ihdr)
      extra.foreach { case (typ, data) => chunk(typ, data) }
      chunk("IDAT", idatz)
      chunk("IEND", Array.emptyByteArray)
      o.toByteArray
    }

    /** 8-bit truecolor (color type 2) non-interlaced PNG from row-major
     *  top-down RGB bytes (h·w·3) — one zlib stream, filter 0 rows. */
    def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb.length == w * h * 3,
        s"need w*h*3 = ${w * h * 3} RGB bytes, got ${rgb.length}")
      val stride = w * 3
      val raw = new Array[Byte](h * (stride + 1)) // filter byte 0 + row
      var y = 0
      while (y < h) {
        System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
        y += 1
      }
      assemblePng(w, h, 8, 2, 0, Nil, deflateRaw(raw))
    }

    /** 16-bit truecolor (color type 2, depth 16) non-interlaced PNG
     *  from row-major big-endian u16 RGB samples (h·w·3 values in
     *  0..65535) — the high-dynamic-range tier (scans, medical,
     *  photography masters). Filter 0 rows. */
    def encodePng16(w: Int, h: Int, rgb16: Array[Int]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb16.length == w * h * 3,
        s"need w*h*3 = ${w * h * 3} u16 samples, got ${rgb16.length}")
      require(rgb16.forall(v => v >= 0 && v <= 65535), "sample outside u16")
      val stride = w * 6
      val raw = new Array[Byte](h * (stride + 1))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w * 3) {
          val v = rgb16(y * w * 3 + x)
          raw(y * (stride + 1) + 1 + 2 * x) = ((v >> 8) & 0xFF).toByte
          raw(y * (stride + 1) + 2 + 2 * x) = (v & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      assemblePng(w, h, 16, 2, 0, Nil, deflateRaw(raw))
    }

    /** 8-bit gray+alpha (color type 4) non-interlaced PNG from
     *  row-major (g, a) byte pairs (h·w·2). Filter 0 rows. */
    def encodeGrayAlphaPng(w: Int, h: Int, ga: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && ga.length == w * h * 2,
        s"need w*h*2 = ${w * h * 2} gray+alpha bytes, got ${ga.length}")
      val stride = w * 2
      val raw = new Array[Byte](h * (stride + 1))
      var y = 0
      while (y < h) {
        System.arraycopy(ga, y * stride, raw, y * (stride + 1) + 1, stride)
        y += 1
      }
      assemblePng(w, h, 8, 4, 0, Nil, deflateRaw(raw))
    }

    /** Palette (color type 3) non-interlaced PNG at bit depth 1/2/4/8:
     *  PLTE from 3·k RGB bytes, per-pixel indices packed big-endian
     *  within each row byte, optional tRNS alpha table. */
    def encodePalettePng(w: Int, h: Int, palette: Array[Byte],
        indices: Array[Byte], bitDepth: Int = 8,
        trns: Array[Byte] = null): Array[Byte] = {
      require(w > 0 && h > 0 && indices.length == w * h,
        s"need w*h = ${w * h} index bytes, got ${indices.length}")
      require(palette.length > 0 && palette.length % 3 == 0 &&
        palette.length <= 768, s"bad palette length ${palette.length}")
      require(bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8,
        s"palette bit depth must be 1/2/4/8, got $bitDepth")
      val k = palette.length / 3
      require(k <= (1 << bitDepth), s"$k palette entries exceed 2^$bitDepth")
      require(indices.forall(i => (i & 0xFF) < k),
        "pixel index out of palette range")
      if (trns != null) require(trns.length <= k, "tRNS longer than palette")
      val rowBytes = (w * bitDepth + 7) / 8
      val raw = new Array[Byte](h * (rowBytes + 1))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bitPos = x * bitDepth
          val at = y * (rowBytes + 1) + 1 + (bitPos >> 3)
          raw(at) = (raw(at) |
            ((indices(y * w + x) & 0xFF) << (8 - bitDepth - (bitPos & 7)))).toByte
          x += 1
        }
        y += 1
      }
      val extra = ("PLTE", palette) ::
        (if (trns != null) List(("tRNS", trns)) else Nil)
      assemblePng(w, h, bitDepth, 3, 0, extra, deflateRaw(raw))
    }

    /** Adam7-INTERLACED 8-bit truecolor PNG: the seven passes written as
     *  independently filtered (filter 0) sub-images in spec order. */
    def encodeAdam7Png(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb.length == w * h * 3,
        s"need w*h*3 = ${w * h * 3} RGB bytes, got ${rgb.length}")
      val passes = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
        (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      val o = new java.io.ByteArrayOutputStream(rgb.length + rgb.length / 8 + 64)
      passes.foreach { case (x0, y0, dx, dy) =>
        val pw = if (x0 >= w) 0 else (w - x0 + dx - 1) / dx
        val ph = if (y0 >= h) 0 else (h - y0 + dy - 1) / dy
        if (pw > 0 && ph > 0) {
          var j = 0
          while (j < ph) {
            o.write(0) // filter: none
            var i = 0
            while (i < pw) {
              val s = ((y0 + j * dy) * w + (x0 + i * dx)) * 3
              o.write(rgb(s)); o.write(rgb(s + 1)); o.write(rgb(s + 2))
              i += 1
            }
            j += 1
          }
        }
      }
      assemblePng(w, h, 8, 2, 1, Nil, deflateRaw(o.toByteArray))
    }

    /** (width, height, channels, "png", row-major top-down floats in
     *  [0,1]) — channels 1/3/4. Walks the chunk list with per-chunk CRC
     *  verification, concatenates IDAT, inflates, reverses the per-PASS
     *  row filters. Supported tiers: gray (0) / truecolor (2) /
     *  gray+alpha (4, expanded to (g,g,g,a) RGBA) / truecolor+alpha (6)
     *  at depth 8 or 16 (16-bit = big-endian samples, v/65535 floats —
     *  the filter pass is byte-level and depth-agnostic, bpp spans the
     *  whole pixel); palette (3) at bit depth 1/2/4/8 — PLTE lookup to
     *  RGB, optional tRNS widens to RGBA; and BOTH interlace methods
     *  (none / Adam7 seven-pass, each pass an independently filtered
     *  sub-image). */
    /** Encode a truecolor PNG carrying textual metadata chunks before
     *  IDAT. `texts` entries are (keyword, text, kind) with kind
     *  0 = tEXt (Latin-1), 1 = zTXt (deflated Latin-1), 2 = iTXt
     *  uncompressed UTF-8, 3 = iTXt deflated UTF-8 (empty language /
     *  translated-keyword fields). */
    def encodePngWithText(w: Int, h: Int, rgb: Array[Byte],
        texts: Seq[(String, String, Int)]): Array[Byte] = {
      require(w > 0 && h > 0 && rgb.length == w * h * 3,
        s"need w*h*3 = ${w * h * 3} RGB bytes, got ${rgb.length}")
      val extra = texts.map { case (k, v, kind) =>
        val kb = k.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        require(kb.length >= 1 && kb.length <= 79,
          s"PNG keyword length ${kb.length} outside 1..79")
        kind match {
          case 0 => ("tEXt", kb ++ (0.toByte +:
            v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
          case 1 => ("zTXt", kb ++ Array[Byte](0, 0) ++
            deflateRaw(v.getBytes(
              java.nio.charset.StandardCharsets.ISO_8859_1)))
          case 2 => ("iTXt", kb ++ Array[Byte](0, 0, 0, 0, 0) ++
            v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case 3 => ("iTXt", kb ++ Array[Byte](0, 1, 0, 0, 0) ++
            deflateRaw(v.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case other => throw new IllegalArgumentException(
            s"PNG text kind $other (0..3)")
        }
      }
      val stride = w * 3
      val raw = new Array[Byte](h * (stride + 1))
      var y = 0
      while (y < h) {
        System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
        y += 1
      }
      assemblePng(w, h, 8, 2, 0, extra, deflateRaw(raw))
    }

    /** Inflate with a hard output cap — text chunks are attacker bytes
     *  and a deflated kilobyte can declare megabytes. */
    private def inflateCapped(b: Array[Byte], off: Int, len: Int,
        cap: Int, what: String): Array[Byte] = {
      val inf = graft.operators.ZlibPool.zlibInflater()
      inf.setInput(b, off, len)
      val o = new java.io.ByteArrayOutputStream(math.min(len * 4, cap))
      val tmp = new Array[Byte](4096)
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(tmp)
            catch {
              case e: java.util.zip.DataFormatException =>
                throw new IllegalArgumentException(
                  s"$what: corrupt deflate stream (${e.getMessage})")
            }
          if (n == 0 && inf.needsDictionary())
            throw new IllegalArgumentException(
              s"$what: preset-dictionary zlib stream (FDICT) not supported")
          if (n == 0 && inf.needsInput()) throw new IllegalArgumentException(
            s"$what: truncated deflate stream")
          o.write(tmp, 0, n)
          require(o.size() <= cap, s"$what exceeds the $cap-byte cap")
        }
      } finally inf.reset() // pooled: release input reference, never end()
      o.toByteArray
    }

    /** Walk a PNG's textual metadata (PNG spec 11.3.4: tEXt, zTXt,
     *  iTXt) and return (keyword, text) pairs in chunk order — the
     *  image-side sibling of ID3/EXIF triage: Title/Author/Software/
     *  Comment ride these chunks in real corpora. CRC-checked like the
     *  pixel decoder; deflated text inflates under a 1 MiB cap; loud
     *  NAMED failures for missing NUL separators, bad compression
     *  methods and truncated chunks. 100 TB shape: per-payload linear
     *  chunk walk, IDAT bytes skipped, blobs never shuffle. */
    def pngTextChunks(p: Array[Byte]): Seq[(String, String)] = {
      require(isPng(p), "not a PNG payload")
      val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val Utf8 = java.nio.charset.StandardCharsets.UTF_8
      var at = 8
      var sawIend = false
      val out = Seq.newBuilder[(String, String)]
      def nulAt(from: Int, end: Int, what: String): Int = {
        var i = from
        while (i < end && p(i) != 0) i += 1
        require(i < end, s"$what: missing NUL separator")
        i
      }
      while (at < p.length && !sawIend) {
        require(at + 8 <= p.length, s"truncated PNG chunk header at $at")
        val len = be32(p, at)
        val typ = new String(p, at + 4, 4, "US-ASCII")
        require(len >= 0 && at + 12 + len.toLong <= p.length,
          s"truncated PNG chunk '$typ' at $at (len $len)")
        require(be32(p, at + 8 + len) == crc(p, at + 4, 4 + len),
          s"PNG chunk '$typ' at $at fails CRC — corrupt payload")
        val d0 = at + 8
        val dEnd = d0 + len
        typ match {
          case "tEXt" =>
            val sep = nulAt(d0, dEnd, "tEXt")
            out += ((new String(p, d0, sep - d0, Latin1),
              new String(p, sep + 1, dEnd - sep - 1, Latin1)))
          case "zTXt" =>
            val sep = nulAt(d0, dEnd, "zTXt")
            require(sep + 1 < dEnd, "zTXt: missing compression method")
            require(p(sep + 1) == 0,
              s"zTXt: unknown compression method ${p(sep + 1)}")
            val text = inflateCapped(p, sep + 2, dEnd - sep - 2,
              1 << 20, "zTXt text")
            out += ((new String(p, d0, sep - d0, Latin1),
              new String(text, Latin1)))
          case "iTXt" =>
            val sep = nulAt(d0, dEnd, "iTXt keyword")
            require(sep + 2 < dEnd, "iTXt: missing compression fields")
            val compFlag = p(sep + 1) & 0xFF
            require(compFlag <= 1, s"iTXt: bad compression flag $compFlag")
            require(p(sep + 2) == 0,
              s"iTXt: unknown compression method ${p(sep + 2)}")
            val langEnd = nulAt(sep + 3, dEnd, "iTXt language")
            val trEnd = nulAt(langEnd + 1, dEnd, "iTXt translated keyword")
            val body =
              if (compFlag == 1) inflateCapped(p, trEnd + 1, dEnd - trEnd - 1,
                1 << 20, "iTXt text")
              else java.util.Arrays.copyOfRange(p, trEnd + 1, dEnd)
            out += ((new String(p, d0, sep - d0, Latin1),
              new String(body, Utf8)))
          case "IEND" => sawIend = true
          case _ => ()
        }
        at += 12 + len
      }
      require(sawIend, "PNG missing IEND — truncated payload")
      out.result()
    }

    def decodePng(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
      require(isPng(p), "not a PNG payload")
      var at = 8
      var w = 0; var h = 0; var sawIhdr = false; var sawIend = false
      var bitDepth = 0; var colorType = 0; var interlace = 0
      var palette: Array[Byte] = null
      var trns: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      while (at < p.length && !sawIend) {
        require(at + 8 <= p.length, s"truncated PNG chunk header at $at")
        val len = be32(p, at)
        val typ = new String(p, at + 4, 4, "US-ASCII")
        require(len >= 0 && at + 12 + len.toLong <= p.length,
          s"truncated PNG chunk '$typ' at $at (len $len)")
        require(be32(p, at + 8 + len) == crc(p, at + 4, 4 + len),
          s"PNG chunk '$typ' at $at fails CRC — corrupt payload")
        typ match {
          case "IHDR" =>
            require(!sawIhdr, "duplicate IHDR")
            require(len == 13, s"IHDR length $len != 13")
            w = be32(p, at + 8); h = be32(p, at + 12)
            require(w > 0 && h > 0, s"bad PNG dimensions ${w}x$h")
            require(w.toLong * h <= (1L << 26),
              s"implausible PNG dimensions ${w}x$h (cap 2^26 pixels)")
            bitDepth = p(at + 16) & 0xFF
            colorType = p(at + 17) & 0xFF
            colorType match {
              case 0 | 2 | 4 | 6 => require(bitDepth == 8 || bitDepth == 16,
                s"PNG color type $colorType at bit depth $bitDepth — " +
                  "unsupported tier (8/16-bit only)")
              case 3 => require(bitDepth == 1 || bitDepth == 2 ||
                  bitDepth == 4 || bitDepth == 8,
                s"PNG palette bit depth $bitDepth — unsupported tier (1/2/4/8)")
              case ct => throw new IllegalArgumentException(
                s"PNG color type $ct is invalid")
            }
            require((p(at + 18) & 0xFF) == 0, "bad PNG compression method")
            require((p(at + 19) & 0xFF) == 0, "bad PNG filter method")
            interlace = p(at + 20) & 0xFF
            require(interlace <= 1, s"bad PNG interlace method $interlace")
            sawIhdr = true
          case "PLTE" =>
            require(sawIhdr, "PLTE before IHDR")
            require(palette == null, "duplicate PLTE")
            require(len > 0 && len % 3 == 0 && len <= 768,
              s"bad PLTE length $len")
            palette = java.util.Arrays.copyOfRange(p, at + 8, at + 8 + len)
          case "tRNS" =>
            require(colorType == 3,
              s"tRNS on color type $colorType — unsupported tier (palette only)")
            require(palette != null, "tRNS before PLTE")
            require(len <= palette.length / 3, s"tRNS longer than palette")
            trns = java.util.Arrays.copyOfRange(p, at + 8, at + 8 + len)
          case "IDAT" =>
            require(sawIhdr, "IDAT before IHDR")
            idat.write(p, at + 8, len)
          case "IEND" => sawIend = true
          case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
        }
        at += 12 + len
      }
      require(sawIhdr, "PNG missing IHDR")
      require(sawIend, "PNG missing IEND — truncated payload")
      require(idat.size() > 0, "PNG missing IDAT")
      if (colorType == 3) require(palette != null, "palette PNG missing PLTE")
      val rawChannels = colorType match {
        case 2 => 3
        case 4 => 2
        case 6 => 4
        case _ => 1
      }
      val outChannels = colorType match {
        case 0 => 1
        case 2 => 3
        case 4 => 4 // gray+alpha expands to (g,g,g,a)
        case 6 => 4
        case _ => if (trns != null) 4 else 3 // palette
      }
      require(w.toLong * h * outChannels <= Int.MaxValue,
        "PNG too large to decode")
      val sampleBits = bitDepth * rawChannels
      // Adam7: seven (x0, y0, dx, dy) sub-grids, each an independently
      // filtered sub-image; a pass with zero width or height contributes
      // NO bytes (not even filter bytes) per the spec
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1))
        else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      def passW(x0: Int, dx: Int): Int =
        if (x0 >= w) 0 else (w - x0 + dx - 1) / dx
      def passH(y0: Int, dy: Int): Int =
        if (y0 >= h) 0 else (h - y0 + dy - 1) / dy
      var rawLen = 0L
      passes.foreach { case (x0, y0, dx, dy) =>
        val pw = passW(x0, dx); val ph = passH(y0, dy)
        if (pw > 0 && ph > 0)
          rawLen += ph.toLong * (1 + (pw.toLong * sampleBits + 7) / 8)
      }
      require(rawLen <= Int.MaxValue, "PNG too large to decode")
      val raw = new Array[Byte](rawLen.toInt)
      val inf = graft.operators.ZlibPool.zlibInflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && inf.needsDictionary())
            // zlib FDICT: inflate() returns 0 with needsInput() FALSE
            // forever — without this check a hostile payload (CRC
            // recomputed) would spin the task instead of failing loudly
            throw new IllegalArgumentException(
              "PNG IDAT requests a zlib preset dictionary — invalid for PNG")
          if (n == 0 && inf.needsInput())
            throw new IllegalArgumentException("truncated PNG IDAT stream")
          got += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt PNG IDAT: ${Option(e.getMessage).getOrElse("bad zlib data")}")
      } finally inf.reset() // pooled: release input reference, never end()
      require(got == raw.length,
        s"PNG IDAT inflated to $got bytes, expected ${raw.length}")
      // per-pass filter reconstruction (RFC 2083 §6.6) + pixel placement
      // (placed directly as normalized floats: v/255 for 8-bit samples,
      // big-endian v/65535 for 16-bit — the byte-level filters above are
      // depth-agnostic, bpp already spans the whole 2/4/6/8-byte pixel)
      val px = new Array[Float](h * w * outChannels)
      val bpp = math.max(1, sampleBits / 8)
      var rawOff = 0
      passes.foreach { case (x0, y0, dx, dy) =>
        val pw = passW(x0, dx); val ph = passH(y0, dy)
        if (pw > 0 && ph > 0) {
          val rowBytes = ((pw.toLong * sampleBits + 7) / 8).toInt
          val buf = new Array[Byte](ph * rowBytes)
          var y = 0
          while (y < ph) {
            val f = raw(rawOff + y * (rowBytes + 1)) & 0xFF
            require(f <= 4, s"bad PNG filter type $f on pass row $y")
            val src = rawOff + y * (rowBytes + 1) + 1
            val dst = y * rowBytes
            var x = 0
            while (x < rowBytes) {
              val rv = raw(src + x) & 0xFF
              val a = if (x >= bpp) buf(dst + x - bpp) & 0xFF else 0
              val b = if (y > 0) buf(dst - rowBytes + x) & 0xFF else 0
              val c = if (x >= bpp && y > 0) buf(dst - rowBytes + x - bpp) & 0xFF else 0
              val v = f match {
                case 0 => rv
                case 1 => rv + a
                case 2 => rv + b
                case 3 => rv + ((a + b) >> 1)
                case 4 =>
                  val pa = math.abs(b - c)
                  val pb = math.abs(a - c)
                  val pc = math.abs(a + b - 2 * c)
                  rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
              }
              buf(dst + x) = (v & 0xFF).toByte
              x += 1
            }
            y += 1
          }
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              val d = ((y0 + j * dy) * w + (x0 + i * dx)) * outChannels
              if (colorType == 3) {
                val bitPos = i * bitDepth
                val idx = ((buf(j * rowBytes + (bitPos >> 3)) & 0xFF) >>
                  (8 - bitDepth - (bitPos & 7))) & ((1 << bitDepth) - 1)
                require(idx * 3 + 2 < palette.length,
                  s"palette index $idx out of range (${palette.length / 3} entries)")
                px(d) = (palette(3 * idx) & 0xFF) / 255.0f
                px(d + 1) = (palette(3 * idx + 1) & 0xFF) / 255.0f
                px(d + 2) = (palette(3 * idx + 2) & 0xFF) / 255.0f
                if (outChannels == 4)
                  px(d + 3) =
                    (if (idx < trns.length) trns(idx) & 0xFF else 0xFF) / 255.0f
              } else {
                val base = j * rowBytes + i * rawChannels * (bitDepth / 8)
                var ch = 0
                while (ch < rawChannels) {
                  val v =
                    if (bitDepth == 8) (buf(base + ch) & 0xFF) / 255.0f
                    else (((buf(base + 2 * ch) & 0xFF) << 8) |
                      (buf(base + 2 * ch + 1) & 0xFF)) / 65535.0f
                  if (colorType == 4) { // (g, a) -> (g, g, g, a)
                    if (ch == 0) { px(d) = v; px(d + 1) = v; px(d + 2) = v }
                    else px(d + 3) = v
                  } else px(d + ch) = v
                  ch += 1
                }
              }
              i += 1
            }
            j += 1
          }
          rawOff += ph * (rowBytes + 1)
        }
      }
      (w, h, outChannels, "png", px)
    }
  }

  /** Decode an AVI payload column into one row per frame —
   *  (frame_idx, meta, pixels) — the REAL-container face of
   *  [[sampleFrames]]'s byte-slicing stub: a partition-local 1:N
   *  explode, payload dropped so frames (small) shuffle, blobs never. */
  def decodeVideoFrames(df: DataFrame, payloadCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("meta", ImageMetaType, nullable = false),
      StructField("pixels", ArrayType(FloatType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.flatMap { r =>
        val (w, h, frames) =
          Avi.decodeAvi(r.getAs[Array[Byte]](payloadIdx))
        (0 until frames.length by stride).map { f =>
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++
            Seq(f, Row(w, h, 3, "avi"), frames(f).toSeq))
        }
      })
    }(encoder)
  }

  /** Decode an animated-GIF payload column into one row per COMPOSITED
   *  frame — (frame_idx, meta, pixels) — the GIF sibling of
   *  [[decodeVideoFrames]]: each row is the full logical screen after
   *  the frame draws, with GIF89a disposal (leave / restore-background
   *  / restore-previous) and transparency applied between frames
   *  ([[Gif.decodeGifFrames]]). Partition-local 1:N explode, payload
   *  dropped so frames shuffle, blobs never. */
  def decodeGifFrames(df: DataFrame, payloadCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("meta", ImageMetaType, nullable = false),
      StructField("pixels", ArrayType(FloatType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.flatMap { r =>
        val (w, h, frames) =
          Gif.decodeGifFrames(r.getAs[Array[Byte]](payloadIdx))
        (0 until frames.length by stride).map { f =>
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++
            Seq(f, Row(w, h, 3, "gif"), frames(f).toSeq))
        }
      })
    }(encoder)
  }

  /** Decode an animated-WebP payload column into one row per COMPOSITED
   *  frame — (frame_idx, meta, pixels) — the WebP sibling of
   *  [[decodeGifFrames]]: each row is the full canvas after the frame
   *  blends/replaces its rect, with dispose-to-background applied
   *  between frames ([[Webp.decodeWebpFrames]]). Partition-local 1:N
   *  explode; blobs never shuffle. */
  def decodeWebpFrames(df: DataFrame, payloadCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("meta", ImageMetaType, nullable = false),
      StructField("pixels", ArrayType(FloatType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.flatMap { r =>
        val (w, h, frames) =
          Webp.decodeWebpFrames(r.getAs[Array[Byte]](payloadIdx))
        (0 until frames.length by stride).map { f =>
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++
            Seq(f, Row(w, h, 4, "webp"), frames(f).toSeq))
        }
      })
    }(encoder)
  }

  /** Real decode where the payload is a real container, deterministic
   *  stub otherwise: 'BM' → BMP, PNG signature → PNG (real inflate),
   *  'RIFF…WAVE' → WAV, anything else falls to [[FakeCodec]] — the
   *  magic-sniff discipline `ModuleFetch` uses for wasm, applied at the
   *  media seam. */
  object SniffCodec extends Codec {
    override def decodeImage(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) =
      if (Containers.isBmp(p)) Containers.decodeBmp(p)
      else if (Png.isPng(p)) Png.decodePng(p)
      else if (Jpeg.isJpeg(p)) Jpeg.decodeJpeg(p)
      else if (Gif.isGif(p)) Gif.decodeGif(p)
      else if (Tiff.isTiff(p)) Tiff.decodeTiff(p)
      else if (Webp.isWebp(p)) Webp.decodeWebp(p)
      else FakeCodec.decodeImage(p)
    override def decodeAudio(p: Array[Byte]): (Int, Array[Float]) =
      if (Adpcm.isAdpcmWav(p)) Adpcm.decodeAdpcmWav(p)
      else if (Containers.isWav(p)) Containers.decodeWav(p)
      else if (Mp3.isMp3(p)) Mp3.decodeMp3Audio(p) // silence-exact tier
      else FakeCodec.decodeAudio(p)
  }

  /** Partition iterator → fixed-size micro-batches → flat output. Keeps
   *  per-task memory at O(BatchSize × payload) and amortizes any per-batch
   *  codec setup, mirroring a vectorized UDF's batch loop. */
  private def batched[A, B](it: Iterator[A], f: Seq[A] => Seq[B]): Iterator[B] =
    it.grouped(BatchSize).flatMap(f)

  // ------------------------------------------------------------------- ops

  /**
   * Decode an image payload column → appended `meta` struct + `pixels`
   * array. Narrow (no shuffle); payload column is dropped from the output
   * by default so downstream stages shuffle features, not blobs.
   */
  def decodeImage(
      df: DataFrame,
      payloadCol: String,
      codec: Codec = FakeCodec,
      keepPayload: Boolean = false): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex
      .filter { case (f, i) => keepPayload || i != payloadIdx }
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("meta", ImageMetaType, nullable = false),
      StructField("pixels", ArrayType(FloatType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, c, fmt, px) = codec.decodeImage(payload)
        Row.fromSeq(keptIdx.toSeq.map(r.get) ++
          Seq(Row(w, h, c, fmt), px.toSeq))
      })
    }(encoder)
  }

  /** Walk an MP3 payload column into a flat metadata row — the
   *  audio-corpus triage face of [[Mp3.mp3Meta]]: version / samplerate /
   *  channels / exact frame, sample and byte accounting / VBR-header
   *  frame count / ID3 prefix size. Narrow (no shuffle), payload
   *  dropped so triage rows shuffle, blobs never; O(frames) time and
   *  O(1) memory per payload. */
  def mp3Meta(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("mpeg_version", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("samples", LongType, nullable = false),
      StructField("stream_bytes", LongType, nullable = false),
      StructField("bitrate_sum_kbps", LongType, nullable = false),
      StructField("xing_frames", IntegerType, nullable = false),
      StructField("id3_size", IntegerType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val m = Mp3.mp3Meta(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keptIdx.toSeq.map(r.get) ++
          Seq[Any](m.version, m.sampleRate, m.channels, m.nFrames, m.samples,
            m.totalBytes, m.bitrateSumKbps, m.xingFrames, m.id3Size))
      })
    }(encoder)
  }

  /**
   * Average-pool resize of a decoded `pixels` array to `outW`×`outH`.
   * Real math over the (fake-)decoded tensor; same batched mapPartitions
   * shape as decode.
   */
  def resizeImage(df: DataFrame, outW: Int, outH: Int): DataFrame = {
    val inSchema = df.schema
    val metaIdx = inSchema.fieldIndex("meta")
    val pxIdx = inSchema.fieldIndex("pixels")
    val outSchema = StructType(
      inSchema.fields.updated(metaIdx,
        StructField("meta", ImageMetaType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val meta = r.getStruct(metaIdx)
        val (w, h, c) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
        val px = r.getSeq[Float](pxIdx)
        val out = new Array[Float](outW * outH * c)
        var oy = 0
        while (oy < outH) {
          var ox = 0
          while (ox < outW) {
            val (x0, x1) = (ox * w / outW, math.max((ox + 1) * w / outW, ox * w / outW + 1))
            val (y0, y1) = (oy * h / outH, math.max((oy + 1) * h / outH, oy * h / outH + 1))
            var ch = 0
            while (ch < c) {
              var sum = 0.0f; var n = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) { sum += px((y * w + x) * c + ch); n += 1; x += 1 }
                y += 1
              }
              out((oy * outW + ox) * c + ch) = sum / n
              ch += 1
            }
            ox += 1
          }
          oy += 1
        }
        Row.fromSeq(r.toSeq.updated(metaIdx, Row(outW, outH, c, meta.getString(3)))
          .updated(pxIdx, out.toSeq))
      })
    }(encoder)
  }

  /**
   * Per-channel feature extraction over decoded pixels → fixed-length
   * `features` array (mean, min, max per channel). The tiny feature vector
   * is what downstream similarity/dedup shuffles — never the pixels.
   */
  def imageFeatures(df: DataFrame, dropPixels: Boolean = true): DataFrame = {
    val inSchema = df.schema
    val metaIdx = inSchema.fieldIndex("meta")
    val pxIdx = inSchema.fieldIndex("pixels")
    val kept = inSchema.fields.zipWithIndex
      .filter { case (_, i) => !(dropPixels && i == pxIdx) }
    val outSchema = StructType(kept.map(_._1) :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val c = r.getStruct(metaIdx).getInt(2)
        val px = r.getSeq[Float](pxIdx)
        val feats = new Array[Float](c * 3)
        var ch = 0
        while (ch < c) {
          var (sum, mn, mx) = (0.0f, Float.MaxValue, Float.MinValue)
          var i = ch
          while (i < px.length) {
            val v = px(i); sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += c
          }
          val n = px.length / c
          feats(ch * 3) = sum / n; feats(ch * 3 + 1) = mn; feats(ch * 3 + 2) = mx
          ch += 1
        }
        Row.fromSeq(keptIdx.toSeq.map(r.get) :+ feats.toSeq)
      })
    }(encoder)
  }

  /**
   * Frame sampling for video payloads: treat the payload as `nFrames`
   * fixed-size frames (from the metadata columns) and emit every
   * `stride`-th frame as its own row — the 1:N explode for media. Output
   * rows carry (parent id cols…, frame_idx, frame payload); the explode
   * happens partition-locally, no shuffle.
   */
  def sampleFrames(
      df: DataFrame,
      payloadCol: String,
      nFramesCol: String,
      stride: Int): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val nFramesIdx = inSchema.fieldIndex(nFramesCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // null payload / frame count: no frames to emit (sibling decode ops
        // substitute a stand-in byte; a 1:N op's natural null answer is N=0)
        if (payload == null || r.isNullAt(nFramesIdx)) Seq.empty[Row]
        else {
        val nFrames = math.max(r.getInt(nFramesIdx), 1)
        val frameSize = math.max(payload.length / nFrames, 1)
        (0 until nFrames by stride).map { f =>
          val from = f * frameSize
          val frame = payload.slice(from, math.min(from + frameSize, payload.length))
          Row.fromSeq(keptIdx.toSeq.map(r.get) ++ Seq(f, frame))
        }
        }
      })
    }(encoder)
  }

  /**
   * Decode an audio payload column → `sample_rate` + `samples` float
   * array; same batched mapPartitions shape as images, payload dropped so
   * downstream stages never shuffle the bytes.
   */
  def decodeAudio(
      df: DataFrame,
      payloadCol: String,
      codec: Codec = FakeCodec): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val kept = inSchema.fields.zipWithIndex.filter(_._2 != payloadIdx)
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("samples", ArrayType(FloatType, containsNull = false))))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val (sr, samples) = codec.decodeAudio(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keptIdx.toSeq.map(r.get) ++ Seq(sr, samples.toSeq))
      })
    }(encoder)
  }

  /** Per-clip audio features over decoded samples: RMS energy, zero-
   *  crossing count, sample count — the tiny vector downstream ops shuffle
   *  instead of waveforms. */
  def audioFeatures(df: DataFrame, dropSamples: Boolean = true): DataFrame = {
    val inSchema = df.schema
    val sIdx = inSchema.fieldIndex("samples")
    val kept = inSchema.fields.zipWithIndex
      .filter { case (_, i) => !(dropSamples && i == sIdx) }
    val outSchema = StructType(kept.map(_._1) ++ Seq(
      StructField("n_samples", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val keptIdx = kept.map(_._2)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val xs = r.getSeq[Float](sIdx)
        var sumSq = 0.0; var zc = 0L
        var i = 0
        while (i < xs.length) {
          val v = xs(i).toDouble
          sumSq += v * v
          if (i > 0 && ((xs(i - 1) < 0 && xs(i) >= 0) || (xs(i - 1) >= 0 && xs(i) < 0))) zc += 1
          i += 1
        }
        val rms = math.sqrt(sumSq / math.max(xs.length, 1))
        // Seq[Any]: a plain Seq(Long, Double, Long) would numerically
        // widen every element to Double and corrupt the row encoding.
        Row.fromSeq(keptIdx.toSeq.map(r.get) ++
          Seq[Any](xs.length.toLong, rms, zc))
      })
    }(encoder)
  }

  /**
   * Perceptual image hash (aHash): decode → grayscale → `side`×`side`
   * average-pool → one bit per cell (1 = cell above the 64-cell mean).
   * Emits a (doc, simhash) signature table — column names chosen so
   * [[graft.operators.Dedup.simHashFromSignatures]] /
   * [[graft.operators.Dedup.simHashAgainst]] consume it unchanged: image
   * near-dup detection is then the SAME 4×16-bit pigeonhole blocking +
   * exact-hamming search the text pipeline uses, and a stored phash index
   * doubles as the cross-snapshot image-decontamination reference.
   *
   * 100 TB shape: one narrow batched `mapPartitions` per image (pixels
   * never leave their split — each payload collapses to 8 bytes before
   * anything shuffles); the downstream match is candidate-bounded by the
   * chunk join, never all-pairs. Near-identical images (re-encodes,
   * small edits) land within a few bits because average-pooling absorbs
   * local perturbation — with the deterministic [[FakeCodec]] the same
   * property holds for payloads sharing long byte prefixes.
   */
  def imagePhash(
      df: DataFrame, payloadCol: String, idCol: String,
      codec: Codec = FakeCodec, side: Int = 8): DataFrame = {
    require(side * side == 64, "phash is a 64-bit signature: side must be 8")
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val idIdx = inSchema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      inSchema.fields(idIdx).copy(name = "doc"),
      StructField("simhash", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val (w, h, c, _, px) = codec.decodeImage(r.getAs[Array[Byte]](payloadIdx))
        // grayscale = channel mean, then side×side average-pool (the same
        // split arithmetic as resizeImage so cell boundaries agree).
        val cells = new Array[Double](side * side)
        var oy = 0
        while (oy < side) {
          var ox = 0
          while (ox < side) {
            val x0 = ox * w / side
            val x1 = math.max((ox + 1) * w / side, x0 + 1)
            val y0 = oy * h / side
            val y1 = math.max((oy + 1) * h / side, y0 + 1)
            var sum = 0.0; var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                var ch = 0; var g = 0.0
                while (ch < c) { g += px((y * w + x) * c + ch); ch += 1 }
                sum += g / c; n += 1
                x += 1
              }
              y += 1
            }
            cells(oy * side + ox) = sum / n
            ox += 1
          }
          oy += 1
        }
        var mean = 0.0
        var i = 0
        while (i < cells.length) { mean += cells(i); i += 1 }
        mean /= cells.length
        var sig = 0L
        i = 0
        while (i < cells.length) {
          if (cells(i) > mean) sig |= (1L << i)
          i += 1
        }
        Row(r.get(idIdx), sig)
      })
    }(encoder)
  }

  /** Build a fake media table from any string column (deterministic:
   *  payload = UTF-8 bytes). Lets the media ops run against the standard
   *  testdata `documents` table. */
  def fakeMediaFromText(df: DataFrame, textCol: String, modality: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("modality", lit(modality))

  /** Append a REAL w×h 24-bpp BMP `payload` built from a binary column
   *  of exactly w·h·3 RGB bytes — the writer half of [[Containers]],
   *  batched like the decoders. Lets round-trip queries synthesize real
   *  container payloads from table data deterministically. */
  def withBmpPayload(df: DataFrame, rgbCol: String, w: Int, h: Int): DataFrame =
    withPayload(df, rgbCol)(bytes => Containers.encodeBmp(w, h, bytes))

  /** Append a REAL w×h 8-bit truecolor PNG `payload` (zlib-compressed,
   *  filter-0 rows) from a binary column of exactly w·h·3 RGB bytes. */
  def withPngPayload(df: DataFrame, rgbCol: String, w: Int, h: Int): DataFrame =
    withPayload(df, rgbCol)(bytes => Png.encodePng(w, h, bytes))

  /** Append a REAL baseline grayscale JPEG `payload` (huffman + DCT
   *  entropy coding, [[Jpeg.encodeGray]]) from a binary column of
   *  exactly w·h 8-bit samples. With `unitQuant` and solid 8×8 tiles
   *  the round-trip is EXACT (DC-only blocks — see [[Jpeg]]). */
  def withJpegPayload(df: DataFrame, grayCol: String, w: Int, h: Int,
      unitQuant: Boolean = false, restartMcus: Int = 0): DataFrame =
    withPayload(df, grayCol)(bytes => Jpeg.encodeGray(w, h, bytes,
      if (unitQuant) Jpeg.UnitQuant else Jpeg.StdLumaQuant, restartMcus))

  /** Append a REAL mono IMA-ADPCM WAV `payload` from a binary column of
   *  little-endian PCM16 bytes (general lossy path). */
  def withAdpcmPayload(df: DataFrame, pcmCol: String, sampleRate: Int,
      blockAlign: Int = 256): DataFrame =
    withPayload(df, pcmCol) { bytes =>
      require(bytes.length % 2 == 0, "PCM16 byte column must have even length")
      val samples = Array.tabulate[Short](bytes.length / 2)(i =>
        (((bytes(2 * i) & 0xFF) | ((bytes(2 * i + 1) & 0xFF) << 8)).toShort))
      Adpcm.encodeAdpcmWav(sampleRate, samples, blockAlign)
    }

  /** [[withAdpcmPayload]] variant for the EXACT-round-trip oracle shape:
   *  each LE int16 in the seed becomes one CONSTANT ADPCM block (the
   *  header stores it verbatim and zero-nibbles keep the predictor
   *  still — see [[Adpcm]]), so the lossy codec round-trips exactly. */
  def withConstantBlockAdpcmPayload(df: DataFrame, seedCol: String,
      sampleRate: Int, blockAlign: Int = 8): DataFrame =
    withPayload(df, seedCol) { seed =>
      require(seed.length % 2 == 0, "seed must be an even byte count")
      val spb = (blockAlign - 4) * 2 + 1
      val samples = new Array[Short](seed.length / 2 * spb)
      var b = 0
      while (b < seed.length / 2) {
        val v = (((seed(2 * b) & 0xFF) | ((seed(2 * b + 1) & 0xFF) << 8)).toShort)
        var i = 0
        while (i < spb) { samples(b * spb + i) = v; i += 1 }
        b += 1
      }
      Adpcm.encodeAdpcmWav(sampleRate, samples, blockAlign)
    }

  /** Append a REAL uncompressed TIFF `payload` ([[Tiff.encodeTiff]])
   *  from a binary column of w·h·3 RGB bytes; `bigEndian` picks the MM
   *  byte order so oracle queries can exercise both header families. */
  def withTiffPayload(df: DataFrame, rgbCol: String, w: Int, h: Int,
      bigEndian: Boolean = false): DataFrame =
    withPayload(df, rgbCol)(bytes =>
      Tiff.encodeTiff(w, h, bytes, channels = 3, bigEndian = bigEndian))

  /** Append a REAL GIF87a `payload` ([[Gif.encodeGif]] — real LZW) from
   *  a binary column holding palette||indices: the first 3·k bytes are
   *  the k-color palette (k a power of two), the rest w·h indices. */
  def withGifPayload(df: DataFrame, srcCol: String, w: Int, h: Int,
      colors: Int): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 3 * colors + w * h,
        s"need 3*colors + w*h = ${3 * colors + w * h} bytes, got ${bytes.length}")
      Gif.encodeGif(w, h,
        java.util.Arrays.copyOfRange(bytes, 3 * colors, bytes.length),
        java.util.Arrays.copyOf(bytes, 3 * colors))
    }

  /** Append a REAL 16-bit truecolor PNG `payload` from a binary column
   *  of 2·w·h·3 big-endian sample bytes ([[Png.encodePng16]]). */
  def withPng16Payload(df: DataFrame, srcCol: String, w: Int, h: Int): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 2 * w * h * 3,
        s"need 2*w*h*3 = ${2 * w * h * 3} bytes, got ${bytes.length}")
      Png.encodePng16(w, h, Array.tabulate(w * h * 3)(i =>
        ((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF)))
    }

  /** Append a REAL 8-bit gray+alpha PNG `payload` from a binary column
   *  of w·h·2 (g, a) bytes ([[Png.encodeGrayAlphaPng]]). */
  def withGrayAlphaPngPayload(df: DataFrame, srcCol: String, w: Int,
      h: Int): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == w * h * 2,
        s"need w*h*2 = ${w * h * 2} bytes, got ${bytes.length}")
      Png.encodeGrayAlphaPng(w, h, bytes)
    }

  /** Append a REAL lossless WebP (VP8L) `payload` from a binary column
   *  of 24 RGB bytes (a 4×2 frame, alpha 255). `arm` picks the
   *  bitstream features so one oracle certifies several decoder paths
   *  on identical pixels: "rgb" literal coding, "green" subtract-green
   *  transform, "pred" whole-image predictor mode 7, "pal" an 8-color
   *  color-indexing transform with sub-byte bundling. */
  def withWebpPayload(df: DataFrame, srcCol: String, arm: String): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 24, s"need 24 RGB bytes, got ${bytes.length}")
      val px = Array.tabulate(8)(i => 0xFF000000 |
        ((bytes(3 * i) & 0xFF) << 16) | ((bytes(3 * i + 1) & 0xFF) << 8) |
        (bytes(3 * i + 2) & 0xFF))
      arm match {
        case "rgb" => Webp.encodeWebpLossless(4, 2, px)
        case "green" => Webp.encodeWebpLossless(4, 2, px,
          Webp.EncodeOpts(subtractGreen = true))
        case "pred" => Webp.encodeWebpLossless(4, 2, px,
          Webp.EncodeOpts(predictorMode = 7))
        case "pal" => Webp.encodeWebpPalette(4, 2, px,
          Array.tabulate[Byte](8)(_.toByte))
        case other => throw new IllegalArgumentException(s"bad WebP arm $other")
      }
    }

  /** Append a REAL lossy VP8 key-frame WebP `payload`: a 32×16 solid
   *  frame whose Y2 / chroma DC coefficients and quantizer index come
   *  from a 4-byte binary column (wY+128, wU+128, wV+128, qi) — the
   *  [[Vp8]] closed-form shape (`solidY`/`solidUv`) a SQL oracle
   *  replays exactly through the dequant→iWHT→iDCT→DC-pred chain. */
  def withVp8SolidPayload(df: DataFrame, srcCol: String): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 4, s"need 4 coeff bytes, got ${bytes.length}")
      Vp8.webpWrap(Vp8.encodeSolid(32, 16,
        (bytes(0) & 0xFF) - 128, (bytes(1) & 0xFF) - 128,
        (bytes(2) & 0xFF) - 128, bytes(3) & 0xFF))
    }

  /** Append a REAL lossy-with-alpha WebP `payload` (VP8X + ALPH +
   *  VP8): a 16×16 solid VP8 key frame (Y2 DC level = byte0 − 128,
   *  q = 0) whose ALPH chunk carries the row-linear TARGET alpha ramp
   *  a(x) = a0 + x·st (a0 = byte1 & 0x7F, st = byte2 % 9 — ramp tops
   *  out below 256, so no mod wraps), stored through filter method
   *  byte3 % 4 and compression method (byte3 div 4) % 2 (raw vs
   *  headerless VP8L). Decode inverts filter + compression exactly, so
   *  an oracle predicts the plane sum as 256·a0 + 1920·st. */
  def withWebpAlphaPayload(df: DataFrame, srcCol: String): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 4, s"need 4 bytes, got ${bytes.length}")
      val wY = (bytes(0) & 0xFF) - 128
      val a0 = bytes(1) & 0x7F
      val st = (bytes(2) & 0xFF) % 9
      val filt = (bytes(3) & 0xFF) % 4
      val comp = ((bytes(3) & 0xFF) / 4) % 2
      val target = Array.tabulate(256)(i => a0 + (i % 16) * st)
      val (head, body) = Webp.encodeAlph(16, 16, target, filt, comp)
      Webp.lossyAlphaWrap(16, 16, Vp8.encodeSolid(16, 16, wY, 0, 0, 0),
        head, body)
    }

  /** Append a REAL 3-frame animated WebP `payload` (VP8X/ANIM/ANMF +
   *  per-frame VP8L) from a binary column of 24 RGB bytes on a 4×2
   *  canvas with a transparent background: frame 0 full-canvas (pixels
   *  p0..p7 from byte triples), frame 1 a 2×1 replace patch at (2,0)
   *  re-using p0..p1 with dispose-to-background, frame 2 a 1×1 patch
   *  at (0,0) from the last byte triple after the dispose cleared
   *  (2,0)-(3,0). Composited sums stay linear in the byte sums, so a
   *  SQL oracle replays every frame exactly. */
  def withAnimatedWebpPayload(df: DataFrame, srcCol: String): DataFrame =
    withPayload(df, srcCol) { bytes =>
      require(bytes.length == 24, s"need 24 RGB bytes, got ${bytes.length}")
      def px(i: Int): Int = 0xFF000000 | ((bytes(3 * i) & 0xFF) << 16) |
        ((bytes(3 * i + 1) & 0xFF) << 8) | (bytes(3 * i + 2) & 0xFF)
      Webp.encodeAnimatedWebp(4, 2, Seq(
        Webp.Frame(0, 0, 4, 2, Array.tabulate(8)(px)),
        Webp.Frame(2, 0, 2, 1, Array(px(0), px(1)), disposeBg = true),
        Webp.Frame(0, 0, 1, 1, Array(px(7)))))
    }

  /** Append a structurally-real MP3 `payload` from a binary column of
   *  9 seed bytes: byte 0 sizes the ID3v2 prefix (b0 mod 64 content
   *  bytes), bytes 1..8 pick one legal MPEG-1 Layer III bitrate each
   *  (index 1 + b mod 14) for 8 VBR frames behind a fixed 128 kbps
   *  Xing frame declaring the 9-frame total ([[Mp3.encodeMp3Structural]]).
   *  Every derived quantity (frame lengths, bitrate sum, samples) is
   *  integer-exact from the seed bytes, so a SQL oracle replays the
   *  whole walk. */
  def withMp3Payload(df: DataFrame, seedCol: String): DataFrame =
    withPayload(df, seedCol) { seed =>
      require(seed.length == 9, s"need 9 seed bytes, got ${seed.length}")
      Mp3.encodeMp3Structural((seed(0) & 0xFF) % 64,
        (1 to 8).map(i => Mp3.kbpsForSeed(seed(i))))
    }

  /** Append a REAL 4-frame animated GIF89a `payload` exercising the
   *  full disposal/transparency matrix from a binary column of 24
   *  palette bytes (8 colors c0..c7) on a 4×2 screen, bg = c0:
   *  frame 0 full-screen indices 0..7 (disposal leave); frame 1 a 2×1
   *  patch at (1,0) = [c0, transparent] with transparent index 7 and
   *  disposal restore-previous; frame 2 a 1×1 patch at (3,1) = c4 with
   *  disposal restore-background; frame 3 a 1×1 patch at (0,0) = c5.
   *  Composited byte sums are therefore linear in the palette-color
   *  sums (all24; all24−c1+c0; all24−c7+c4; all24−c7+c5), which a SQL
   *  oracle replays exactly from the hex digests. */
  def withAnimatedGifPayload(df: DataFrame, paletteCol: String): DataFrame =
    withPayload(df, paletteCol) { pal =>
      require(pal.length == 24, s"need 24 palette bytes, got ${pal.length}")
      Gif.encodeAnimatedGif(4, 2, pal, bgIndex = 0, Seq(
        Gif.Frame(0, 0, 4, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)),
        Gif.Frame(1, 0, 2, 1, Array[Byte](0, 7), disposal = 3, transparentIdx = 7),
        Gif.Frame(3, 1, 1, 1, Array[Byte](4), disposal = 2),
        Gif.Frame(0, 0, 1, 1, Array[Byte](5))))
    }

  /** [[withJpegPayload]] variant for the EXACT-round-trip oracle shape:
   *  each of the `tiles`×`tiles` seed bytes becomes a solid
   *  `tileSize`×`tileSize` gray tile (tileSize = 8 makes every JPEG
   *  block DC-only, which survives unit-quant coding exactly). */
  def withTiledJpegPayload(df: DataFrame, seedCol: String, tiles: Int,
      tileSize: Int = 8, restartMcus: Int = 0): DataFrame =
    withPayload(df, seedCol) { seed =>
      require(seed.length == tiles * tiles,
        s"need tiles*tiles = ${tiles * tiles} seed bytes, got ${seed.length}")
      val w = tiles * tileSize
      val gray = new Array[Byte](w * w)
      var y = 0
      while (y < w) {
        var x = 0
        while (x < w) {
          gray(y * w + x) = seed((y / tileSize) * tiles + (x / tileSize))
          x += 1
        }
        y += 1
      }
      Jpeg.encodeGray(w, w, gray, Jpeg.UnitQuant, restartMcus)
    }

  /** Append a REAL color 4:2:0 baseline JPEG `payload`: seed bytes
   *  become solid 16x16 RGB MCUs (MCU m = seed triple 3m..3m+2) of a
   *  (mcus*16)-square image encoded through [[Jpeg.encodeRgb]] with
   *  chroma subsampling ON. At quality=100 the scaled tables collapse
   *  to unit quant, constant MCUs make every luma/chroma block DC-only
   *  (and the 2x2 chroma mean of a constant is that constant exactly),
   *  so the decode is bit-exact modulo the two documented integer
   *  color-space conversions — which an oracle replays with
   *  floor(x+0.5) arithmetic. Exercises the full color path: RGB->YCbCr,
   *  4-luma+2-chroma MCU interleave, three DC predictors, chroma
   *  huffman tables, nearest-neighbor upsampling, YCbCr->RGB. */
  def withMcuColorJpegPayload(df: DataFrame, seedCol: String, mcus: Int,
      quality: Int = 100): DataFrame =
    withPayload(df, seedCol) { seed =>
      require(seed.length == mcus * mcus * 3,
        s"need mcus*mcus*3 = ${mcus * mcus * 3} seed bytes, got ${seed.length}")
      val w = mcus * 16
      val rgb = new Array[Byte](w * w * 3)
      var y = 0
      while (y < w) {
        var x = 0
        while (x < w) {
          val m = (y / 16) * mcus + (x / 16)
          val d = (y * w + x) * 3
          rgb(d) = seed(3 * m)
          rgb(d + 1) = seed(3 * m + 1)
          rgb(d + 2) = seed(3 * m + 2)
          x += 1
        }
        y += 1
      }
      Jpeg.encodeRgb(w, w, rgb, quality, subsample420 = true)
    }

  /** Append a REAL mono PCM16 WAV `payload` from a binary column of
   *  little-endian sample bytes (length must be even). */
  def withWavPayload(df: DataFrame, pcmCol: String, sampleRate: Int): DataFrame =
    withPayload(df, pcmCol) { bytes =>
      require(bytes.length % 2 == 0, "PCM16 byte column must have even length")
      val samples = Array.tabulate[Short](bytes.length / 2)(i =>
        (((bytes(2 * i) & 0xFF) | ((bytes(2 * i + 1) & 0xFF) << 8)).toShort))
      Containers.encodeWav(sampleRate, samples)
    }

  /** Append a REAL AVI `payload` from a binary column of exactly
   *  nFrames·w·h·3 row-major RGB bytes (frames concatenated). */
  def withAviPayload(df: DataFrame, rgbCol: String, w: Int, h: Int,
      nFrames: Int, fps: Int = 25): DataFrame =
    withPayload(df, rgbCol) { bytes =>
      require(bytes.length == nFrames * w * h * 3,
        s"need nFrames*w*h*3 = ${nFrames * w * h * 3} bytes, got ${bytes.length}")
      Avi.encodeAvi(w, h, fps, (0 until nFrames).map(f =>
        java.util.Arrays.copyOfRange(bytes, f * w * h * 3, (f + 1) * w * h * 3)))
    }

  /** Heterogeneous-corpus builder: ONE binary `payload` column whose
   *  format varies per row — `kindCol` 0 → BMP 4×2, 1 → PNG 4×2 (both
   *  from the first 24 seed bytes), 2 → unit-quant tiled JPEG 32×32
   *  (first 16 seed bytes, restart markers), 3 → PALETTE PNG 4×2
   *  (bit depth 4: the 24 seed bytes are the 8-entry PLTE, pixel i
   *  indexes entry seed(i) mod 8), 4 → Adam7-INTERLACED truecolor PNG
   *  4×2 (same 24 bytes, seven-pass layout incl. empty passes). The
   *  realistic input shape for [[SniffCodec]]: a single decode pass
   *  must dispatch per row. */
  def withMixedImagePayload(df: DataFrame, seedCol: String,
      kindCol: String): DataFrame = {
    val inSchema = df.schema
    val seedIdx = inSchema.fieldIndex(seedCol)
    val kindIdx = inSchema.fieldIndex(kindCol)
    val outSchema = StructType(inSchema.fields :+
      StructField("payload", org.apache.spark.sql.types.BinaryType,
        nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        val seed = r.getAs[Array[Byte]](seedIdx)
        require(seed.length >= 24, s"need >= 24 seed bytes, got ${seed.length}")
        val payload = r.getAs[Number](kindIdx).longValue() match {
          case 0L => Containers.encodeBmp(4, 2, java.util.Arrays.copyOf(seed, 24))
          case 1L => Png.encodePng(4, 2, java.util.Arrays.copyOf(seed, 24))
          case 2L =>
            val tiles = java.util.Arrays.copyOf(seed, 16)
            val gray = new Array[Byte](32 * 32)
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 32) {
                gray(y * 32 + x) = tiles((y / 8) * 4 + (x / 8)); x += 1
              }
              y += 1
            }
            Jpeg.encodeGray(32, 32, gray, Jpeg.UnitQuant, restartMcus = 5)
          case 3L =>
            val idx = Array.tabulate[Byte](8)(i => ((seed(i) & 0xFF) % 8).toByte)
            Png.encodePalettePng(4, 2, java.util.Arrays.copyOf(seed, 24),
              idx, bitDepth = 4)
          case 4L => Png.encodeAdam7Png(4, 2, java.util.Arrays.copyOf(seed, 24))
          case k => throw new IllegalArgumentException(s"bad media kind $k")
        }
        Row.fromSeq(r.toSeq :+ payload)
      })
    }(encoder)
  }

  private def withPayload(df: DataFrame, srcCol: String)(
      enc: Array[Byte] => Array[Byte]): DataFrame = {
    val inSchema = df.schema
    val srcIdx = inSchema.fieldIndex(srcCol)
    val outSchema = StructType(inSchema.fields :+
      StructField("payload", org.apache.spark.sql.types.BinaryType,
        nullable = false))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      batched[Row, Row](rows, batch => batch.map { r =>
        Row.fromSeq(r.toSeq :+ enc(r.getAs[Array[Byte]](srcIdx)))
      })
    }(encoder)
  }
}
