package graft.operators

/**
 * Real GIF codec (87a/89a) — LZW decompression and compression in pure
 * integer arithmetic, the fourth real image format next to
 * [[Multimodal.Containers]] BMP, [[Png]] and [[Jpeg]] (old web corpora
 * are full of GIFs). GIF is LOSSLESS for paletted data, so — like PNG —
 * the round-trip is bit-exact and the DuckDB oracle replays decoded
 * byte sums from hex digests (`mm_gif_roundtrip`).
 *
 * Supported tier: GIF87a/89a, global or local color table, interlaced
 * and non-interlaced. [[decodeGif]] keeps the still-image contract
 * (first frame only, extensions skipped — same as every thumbnail
 * pipeline); [[decodeGifFrames]] is the 1:N animation face, compositing
 * every frame with GIF89a disposal (leave / restore-background /
 * restore-previous) and transparency.
 * Loud NAMED failures: missing color table, truncated LZW data, code
 * overflow, missing trailer.
 *
 * 100 TB shape: decode/encode are partition-local per payload inside
 * [[Multimodal.decodeImage]]'s batched loop — no shuffle, memory is one
 * 4096-entry LZW dictionary + the frame, blobs never move.
 */
object Gif {

  def isGif(p: Array[Byte]): Boolean =
    p != null && p.length >= 6 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  private def le16(p: Array[Byte], at: Int): Int =
    Multimodal.Containers.le16(p, at)

  // --------------------------------------------------------------- decode

  /** (width, height, 3, "gif", row-major top-down RGB floats in [0,1])
   *  of the FIRST frame, composited at its (left, top) offset on the
   *  logical screen (background = palette entry of the bg index, or
   *  black without a global table). */
  def decodeGif(p: Array[Byte]): (Int, Int, Int, String, Array[Float]) = {
    require(isGif(p), "not a GIF payload")
    require(p.length >= 13, "truncated GIF header")
    val sw = le16(p, 6)
    val sh = le16(p, 8)
    require(sw > 0 && sh > 0, s"bad GIF dimensions ${sw}x$sh")
    // hard pixel cap: a corrupt 16-bit dim pair (65535 x 65535) would
    // otherwise allocate gigabytes and OOM the task instead of failing
    require(sw.toLong * sh <= (1L << 26),
      s"implausible GIF dimensions ${sw}x$sh (cap 2^26 pixels)")
    val flags = p(10) & 0xFF
    val bgIndex = p(11) & 0xFF
    var at = 13
    var globalPal: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      require(at + 3 * n <= p.length, "truncated GIF global color table")
      globalPal = java.util.Arrays.copyOfRange(p, at, at + 3 * n)
      at += 3 * n
    }
    val out = new Array[Float](sw * sh * 3)
    if (globalPal != null && bgIndex * 3 + 2 < globalPal.length) {
      var i = 0
      while (i < sw * sh) {
        out(i * 3) = (globalPal(bgIndex * 3) & 0xFF) / 255.0f
        out(i * 3 + 1) = (globalPal(bgIndex * 3 + 1) & 0xFF) / 255.0f
        out(i * 3 + 2) = (globalPal(bgIndex * 3 + 2) & 0xFF) / 255.0f
        i += 1
      }
    }
    var sawFrame = false
    var done = false
    while (!done) {
      require(at < p.length, "truncated GIF before trailer")
      (p(at) & 0xFF) match {
        case 0x3B => done = true // trailer
        case 0x21 => // extension: label + sub-blocks, all skipped
          require(at + 2 <= p.length, "truncated GIF extension")
          at += 2
          var sz = -1
          while (sz != 0) {
            require(at < p.length, "truncated GIF extension sub-block")
            sz = p(at) & 0xFF
            at += 1 + sz
            require(at <= p.length, "truncated GIF extension sub-block")
          }
        case 0x2C => // image descriptor
          require(at + 10 <= p.length, "truncated GIF image descriptor")
          val left = le16(p, at + 1)
          val top = le16(p, at + 3)
          val iw = le16(p, at + 5)
          val ih = le16(p, at + 7)
          val iflags = p(at + 9) & 0xFF
          at += 10
          require(iw > 0 && ih > 0 && left + iw <= sw && top + ih <= sh,
            s"GIF frame ${iw}x$ih at ($left,$top) outside ${sw}x$sh screen")
          var pal = globalPal
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            require(at + 3 * n <= p.length, "truncated GIF local color table")
            pal = java.util.Arrays.copyOfRange(p, at, at + 3 * n)
            at += 3 * n
          }
          require(pal != null, "GIF frame has no color table (global or local)")
          val interlaced = (iflags & 0x40) != 0
          require(at < p.length, "truncated GIF before LZW data")
          val minCodeSize = p(at) & 0xFF
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad GIF LZW min code size $minCodeSize")
          at += 1
          // concatenate LZW sub-blocks
          val lzw = new java.io.ByteArrayOutputStream()
          var sz = -1
          while (sz != 0) {
            require(at < p.length, "truncated GIF LZW sub-block")
            sz = p(at) & 0xFF
            at += 1
            require(at + sz <= p.length, "truncated GIF LZW sub-block")
            lzw.write(p, at, sz)
            at += sz
          }
          if (!sawFrame) { // decode only the first frame
            val indices = lzwDecode(lzw.toByteArray, minCodeSize, iw * ih)
            // interlace pass row order: 0,8,16.. / 4,12.. / 2,6.. / 1,3..
            val rowOf: Int => Int =
              if (!interlaced) identity
              else {
                val order = new Array[Int](ih)
                var r = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                     y <- start until ih by step) { order(r) = y; r += 1 }
                i => order(i)
              }
            var row = 0
            while (row < ih) {
              val y = top + rowOf(row)
              var x = 0
              while (x < iw) {
                val idx = indices(row * iw + x) & 0xFF
                require(idx * 3 + 2 < pal.length,
                  s"GIF pixel index $idx outside ${pal.length / 3}-color table")
                val d = (y * sw + left + x) * 3
                out(d) = (pal(idx * 3) & 0xFF) / 255.0f
                out(d + 1) = (pal(idx * 3 + 1) & 0xFF) / 255.0f
                out(d + 2) = (pal(idx * 3 + 2) & 0xFF) / 255.0f
                x += 1
              }
              row += 1
            }
            sawFrame = true
          }
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02X at $at")
      }
    }
    require(sawFrame, "GIF has no image frame")
    (sw, sh, 3, "gif", out)
  }

  /** Variable-width LZW decode (GIF flavor: clear + EOI codes, dict to
   *  4096, code width grows AFTER the dict fills the current width). */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      nPixels: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeWidth = minCodeSize + 1
    val out = new Array[Byte](nPixels)
    var outAt = 0
    var acc = 0
    var nbits = 0
    var at = 0
    var prev = -1
    val scratch = new Array[Byte](4096)

    def expand(code0: Int): Int = { // writes the string for code0, returns first byte
      var code = code0
      var n = 0
      while (code >= clear + 2) {
        scratch(n) = append(code); n += 1
        code = prefix(code)
      }
      require(code < clear, s"corrupt GIF LZW stream (dangling code $code0)")
      val first = code
      require(outAt + n + 1 <= out.length,
        "GIF LZW data overruns the declared frame size")
      out(outAt) = first.toByte
      outAt += 1
      var i = n - 1
      while (i >= 0) { out(outAt) = scratch(i); outAt += 1; i -= 1 }
      first
    }

    var finished = false
    while (!finished && outAt < nPixels) {
      while (nbits < codeWidth) {
        require(at < data.length, "truncated GIF LZW stream")
        acc |= (data(at) & 0xFF) << nbits
        nbits += 8
        at += 1
      }
      val code = acc & ((1 << codeWidth) - 1)
      acc >>>= codeWidth
      nbits -= codeWidth
      if (code == clear) {
        dictSize = eoi + 1
        codeWidth = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        finished = true
      } else if (prev < 0) {
        require(code < clear, s"corrupt GIF LZW stream (first code $code)")
        out(outAt) = code.toByte
        outAt += 1
        prev = code
      } else {
        // KwKwK (code == dictSize) is only legal while the dict can still
        // grow: at 4096 prev may BE 4096-adjacent garbage and prefix(4096)
        // would AIOOBE instead of the promised named failure
        require(code < dictSize || (code == dictSize && dictSize < 4096),
          s"corrupt GIF LZW code $code (dict size $dictSize)")
        val first =
          if (code < dictSize) expand(code)
          else { // KwKwK case: code == dictSize -> prev's string + its head
            val n = stringLen(prev, clear, prefix)
            require(outAt + n + 1 <= out.length,
              "GIF LZW data overruns the declared frame size")
            expandInto(prev, clear, prefix, append, out, outAt, scratch)
            val f = out(outAt)
            outAt += n
            out(outAt) = f
            outAt += 1
            f
          }
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          append(dictSize) = first.toByte
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    require(outAt == nPixels,
      s"GIF LZW stream produced $outAt of $nPixels pixels")
    out
  }

  private def stringLen(code0: Int, clear: Int, prefix: Array[Int]): Int = {
    var code = code0
    var n = 1
    while (code >= clear + 2) { code = prefix(code); n += 1 }
    n
  }

  private def expandInto(code0: Int, clear: Int, prefix: Array[Int],
      append: Array[Byte], out: Array[Byte], outAt: Int,
      scratch: Array[Byte]): Unit = {
    var code = code0
    var n = 0
    while (code >= clear + 2) {
      scratch(n) = append(code); n += 1
      code = prefix(code)
    }
    out(outAt) = code.toByte
    var i = n - 1
    var o = outAt + 1
    while (i >= 0) { out(o) = scratch(i); o += 1; i -= 1 }
  }

  // --------------------------------------------------------------- encode

  /** GIF87a from palette indices: `indices` (w·h bytes, row-major
   *  top-down) into `palette` (3·k RGB bytes, k a power of two in
   *  [2, 256]). Real variable-width LZW compression. */
  def encodeGif(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"need w*h = ${w * h} index bytes, got ${indices.length}")
    val k = palette.length / 3
    require(palette.length % 3 == 0 && k >= 2 && k <= 256 &&
      (k & (k - 1)) == 0, s"palette must be a power-of-two 2..256 colors, got $k")
    require(indices.forall(i => (i & 0xFF) < k),
      "palette index out of range")
    var bits = 1
    while ((1 << bits) < k) bits += 1
    val o = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    "GIF87a".getBytes("US-ASCII").foreach(o.write(_))
    o.write(w & 0xFF); o.write((w >> 8) & 0xFF)
    o.write(h & 0xFF); o.write((h >> 8) & 0xFF)
    o.write(0x80 | (bits - 1)) // global table, 2^bits colors
    o.write(0); o.write(0) // bg index, aspect
    o.write(palette, 0, palette.length)
    o.write(0x2C) // image descriptor at (0,0), no local table
    o.write(0); o.write(0); o.write(0); o.write(0)
    o.write(w & 0xFF); o.write((w >> 8) & 0xFF)
    o.write(h & 0xFF); o.write((h >> 8) & 0xFF)
    o.write(0)
    writeLzwImage(o, indices, math.max(2, bits))
    o.write(0x3B) // trailer
    o.toByteArray
  }

  /** LZW-encode `indices` and write min-code-size byte + ≤255-byte
   *  sub-blocks + terminator to `o` (the per-frame tail of an image
   *  descriptor, shared by [[encodeGif]] and [[encodeAnimatedGif]]).
   *  Standard dict-reset protocol, width bumped at the decoder-matching
   *  boundary. */
  private def writeLzwImage(o: java.io.ByteArrayOutputStream,
      indices: Array[Byte], minCodeSize: Int): Unit = {
    o.write(minCodeSize)
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        lzw.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var codeWidth = minCodeSize + 1
    var dict = new java.util.HashMap[Long, Integer]()
    var dictSize = eoi + 1
    put(clear, codeWidth)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val c = indices(i) & 0xFF
      if (prev < 0) prev = c
      else {
        val key = (prev.toLong << 8) | c
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev, codeWidth)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            if (dictSize == (1 << codeWidth) + 1 && codeWidth < 12) {
              // GIF encoders bump width when the NEXT code wouldn't fit:
              // decoder bumps after filling (1 << width), so emit at the
              // matching boundary
              codeWidth += 1
            }
          } else {
            put(clear, codeWidth)
            dict = new java.util.HashMap[Long, Integer]()
            dictSize = eoi + 1
            codeWidth = minCodeSize + 1
          }
          prev = c
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev, codeWidth)
    put(eoi, codeWidth)
    if (nbits > 0) lzw.write((acc & 0xFF).toInt)
    // sub-blocks of <= 255 bytes
    val z = lzw.toByteArray
    var at = 0
    while (at < z.length) {
      val n = math.min(255, z.length - at)
      o.write(n)
      o.write(z, at, n)
      at += n
    }
    o.write(0) // block terminator
  }

  // ----------------------------------------------------------- animation

  /** One animation frame: palette `indices` for an `w`×`h` rect placed
   *  at (`left`,`top`) on the logical screen. `disposal` is the GIF89a
   *  graphic-control disposal method applied AFTER this frame shows
   *  (0/1 = leave, 2 = restore the rect to the background color,
   *  3 = restore the canvas to its pre-frame state); `transparentIdx`
   *  (if >= 0) marks a palette index whose pixels leave the canvas
   *  untouched. */
  final case class Frame(left: Int, top: Int, w: Int, h: Int,
      indices: Array[Byte], disposal: Int = 0, transparentIdx: Int = -1)

  /** Animated GIF89a: global `palette` (3·k bytes, k a power of two in
   *  [2, 256]), `bgIndex` background entry, one graphic-control
   *  extension + image descriptor + real LZW data per frame. */
  def encodeAnimatedGif(sw: Int, sh: Int, palette: Array[Byte],
      bgIndex: Int, frames: Seq[Frame]): Array[Byte] = {
    require(sw > 0 && sh > 0, s"bad screen ${sw}x$sh")
    val k = palette.length / 3
    require(palette.length % 3 == 0 && k >= 2 && k <= 256 &&
      (k & (k - 1)) == 0, s"palette must be a power-of-two 2..256 colors, got $k")
    require(bgIndex >= 0 && bgIndex < k, s"bg index $bgIndex outside $k colors")
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    var bits = 1
    while ((1 << bits) < k) bits += 1
    val o = new java.io.ByteArrayOutputStream(256)
    "GIF89a".getBytes("US-ASCII").foreach(o.write(_))
    o.write(sw & 0xFF); o.write((sw >> 8) & 0xFF)
    o.write(sh & 0xFF); o.write((sh >> 8) & 0xFF)
    o.write(0x80 | (bits - 1)) // global table, 2^bits colors
    o.write(bgIndex); o.write(0) // bg index, aspect
    o.write(palette, 0, palette.length)
    frames.foreach { f =>
      require(f.w > 0 && f.h > 0 && f.left >= 0 && f.top >= 0 &&
        f.left + f.w <= sw && f.top + f.h <= sh,
        s"frame ${f.w}x${f.h} at (${f.left},${f.top}) outside ${sw}x$sh screen")
      require(f.indices.length == f.w * f.h,
        s"need w*h = ${f.w * f.h} index bytes, got ${f.indices.length}")
      require(f.indices.forall(i => (i & 0xFF) < k), "palette index out of range")
      require(f.disposal >= 0 && f.disposal <= 3, s"bad disposal ${f.disposal}")
      require(f.transparentIdx < k, s"transparent index ${f.transparentIdx} outside $k colors")
      o.write(0x21); o.write(0xF9); o.write(4) // graphic control extension
      o.write((f.disposal << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      o.write(0); o.write(0) // delay
      o.write(math.max(0, f.transparentIdx))
      o.write(0) // GCE terminator
      o.write(0x2C) // image descriptor, no local table, non-interlaced
      o.write(f.left & 0xFF); o.write((f.left >> 8) & 0xFF)
      o.write(f.top & 0xFF); o.write((f.top >> 8) & 0xFF)
      o.write(f.w & 0xFF); o.write((f.w >> 8) & 0xFF)
      o.write(f.h & 0xFF); o.write((f.h >> 8) & 0xFF)
      o.write(0)
      writeLzwImage(o, f.indices, math.max(2, bits))
    }
    o.write(0x3B) // trailer
    o.toByteArray
  }

  /** Decode ALL frames of a GIF, composited per the GIF89a animation
   *  model: each emitted frame is the full logical screen AFTER the
   *  frame draws (transparent pixels leave the canvas), and the frame's
   *  disposal method then runs before the next (0/1 leave, 2 restore
   *  the rect to the background color, 3 restore the pre-frame canvas).
   *  Returns (screenW, screenH, composited top-down RGB float frames).
   *  The 1:N sibling of [[decodeGif]]'s still-image contract — same
   *  header/LZW machinery, same named failures. */
  def decodeGifFrames(p: Array[Byte]): (Int, Int, Seq[Array[Float]]) = {
    require(isGif(p), "not a GIF payload")
    require(p.length >= 13, "truncated GIF header")
    val sw = le16(p, 6)
    val sh = le16(p, 8)
    require(sw > 0 && sh > 0, s"bad GIF dimensions ${sw}x$sh")
    // hard pixel cap: a corrupt 16-bit dim pair (65535 x 65535) would
    // otherwise allocate gigabytes and OOM the task instead of failing
    require(sw.toLong * sh <= (1L << 26),
      s"implausible GIF dimensions ${sw}x$sh (cap 2^26 pixels)")
    val flags = p(10) & 0xFF
    val bgIndex = p(11) & 0xFF
    var at = 13
    var globalPal: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      require(at + 3 * n <= p.length, "truncated GIF global color table")
      globalPal = java.util.Arrays.copyOfRange(p, at, at + 3 * n)
      at += 3 * n
    }
    val bg = new Array[Float](3)
    if (globalPal != null && bgIndex * 3 + 2 < globalPal.length) {
      bg(0) = (globalPal(bgIndex * 3) & 0xFF) / 255.0f
      bg(1) = (globalPal(bgIndex * 3 + 1) & 0xFF) / 255.0f
      bg(2) = (globalPal(bgIndex * 3 + 2) & 0xFF) / 255.0f
    }
    val canvas = new Array[Float](sw * sh * 3)
    var i = 0
    while (i < sw * sh) {
      canvas(i * 3) = bg(0); canvas(i * 3 + 1) = bg(1); canvas(i * 3 + 2) = bg(2)
      i += 1
    }
    val frames = Seq.newBuilder[Array[Float]]
    var nFrames = 0
    var disposal = 0
    var transparentIdx = -1
    var done = false
    while (!done) {
      require(at < p.length, "truncated GIF before trailer")
      (p(at) & 0xFF) match {
        case 0x3B => done = true
        case 0x21 =>
          require(at + 2 <= p.length, "truncated GIF extension")
          val label = p(at + 1) & 0xFF
          at += 2
          if (label == 0xF9) { // graphic control: disposal + transparency
            require(at < p.length && (p(at) & 0xFF) == 4,
              "bad GIF graphic control extension size")
            require(at + 5 < p.length,
              "truncated GIF graphic control extension")
            val packed = p(at + 1) & 0xFF
            disposal = (packed >> 2) & 7
            transparentIdx = if ((packed & 1) != 0) p(at + 4) & 0xFF else -1
            at += 5
            require(at < p.length && p(at) == 0,
              "unterminated GIF graphic control extension")
            at += 1
          } else { // other extensions: skip sub-blocks
            var sz = -1
            while (sz != 0) {
              require(at < p.length, "truncated GIF extension sub-block")
              sz = p(at) & 0xFF
              at += 1 + sz
              require(at <= p.length, "truncated GIF extension sub-block")
            }
          }
        case 0x2C =>
          require(at + 10 <= p.length, "truncated GIF image descriptor")
          val left = le16(p, at + 1)
          val top = le16(p, at + 3)
          val iw = le16(p, at + 5)
          val ih = le16(p, at + 7)
          val iflags = p(at + 9) & 0xFF
          at += 10
          require(iw > 0 && ih > 0 && left + iw <= sw && top + ih <= sh,
            s"GIF frame ${iw}x$ih at ($left,$top) outside ${sw}x$sh screen")
          var pal = globalPal
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            require(at + 3 * n <= p.length, "truncated GIF local color table")
            pal = java.util.Arrays.copyOfRange(p, at, at + 3 * n)
            at += 3 * n
          }
          require(pal != null, "GIF frame has no color table (global or local)")
          val interlaced = (iflags & 0x40) != 0
          require(at < p.length, "truncated GIF before LZW data")
          val minCodeSize = p(at) & 0xFF
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad GIF LZW min code size $minCodeSize")
          at += 1
          val lzw = new java.io.ByteArrayOutputStream()
          var sz = -1
          while (sz != 0) {
            require(at < p.length, "truncated GIF LZW sub-block")
            sz = p(at) & 0xFF
            at += 1
            require(at + sz <= p.length, "truncated GIF LZW sub-block")
            lzw.write(p, at, sz)
            at += sz
          }
          val indices = lzwDecode(lzw.toByteArray, minCodeSize, iw * ih)
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](ih)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) { order(r) = y; r += 1 }
              j => order(j)
            }
          val saved = if (disposal == 3) canvas.clone() else null
          var row = 0
          while (row < ih) {
            val y = top + rowOf(row)
            var x = 0
            while (x < iw) {
              val idx = indices(row * iw + x) & 0xFF
              if (idx != transparentIdx) {
                require(idx * 3 + 2 < pal.length,
                  s"GIF pixel index $idx outside ${pal.length / 3}-color table")
                val d = (y * sw + left + x) * 3
                canvas(d) = (pal(idx * 3) & 0xFF) / 255.0f
                canvas(d + 1) = (pal(idx * 3 + 1) & 0xFF) / 255.0f
                canvas(d + 2) = (pal(idx * 3 + 2) & 0xFF) / 255.0f
              }
              x += 1
            }
            row += 1
          }
          frames += canvas.clone()
          nFrames += 1
          if (disposal == 2) { // restore the frame rect to background
            var y = top
            while (y < top + ih) {
              var x = left
              while (x < left + iw) {
                val d = (y * sw + x) * 3
                canvas(d) = bg(0); canvas(d + 1) = bg(1); canvas(d + 2) = bg(2)
                x += 1
              }
              y += 1
            }
          } else if (disposal == 3) {
            System.arraycopy(saved, 0, canvas, 0, canvas.length)
          }
          disposal = 0
          transparentIdx = -1
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02X at $at")
      }
    }
    require(nFrames > 0, "GIF has no image frame")
    (sw, sh, frames.result())
  }
}
