package graft.operators

/**
 * MP3 (MPEG audio Layer III) METADATA walk — the audio-corpus triage
 * operator: ID3v2 skip, frame-by-frame header parse (version / layer /
 * bitrate / samplerate / padding / channel-mode tables from the public
 * MPEG-1/2 spec), Xing/Info and VBRI VBR-header extraction, exact
 * duration-in-samples and byte accounting. Audio corpora arrive
 * overwhelmingly as MP3; triage (duration, bitrate mix, VBR-ness,
 * corruption) must run BEFORE any decode spend. Everything here is
 * integer-exact, so a SQL oracle can replay the walk from the bytes
 * that built the payload (`mm_mp3_meta`).
 *
 * Supported tier: MPEG-1 and MPEG-2/2.5 (LSF) Layer III, CBR and VBR
 * streams, ID3v2.x prefix (syncsafe size), Xing/Info and VBRI headers.
 * Loud NAMED failures: Layer I/II (different frame-length formula —
 * out of the MP3 contract), free-format bitrate, reserved
 * version/samplerate indices, bad sync, truncated frames. Full
 * Layer-III AUDIO decode (huffman + IMDCT + synthesis filterbank)
 * stays a documented [[Multimodal.Codec]] seam — [[decodeMp3Audio]]
 * throws a named rejection, mirroring the MP3/H.264/WebP note at
 * `Multimodal.scala` (reference keeps codecs behind opaque guests:
 * reference: host-go/engine/engine.go:1).
 *
 * 100 TB shape: the walk is partition-local per payload (a few bytes
 * read per frame header, O(frames) time, O(1) memory); blobs never
 * shuffle — only the small meta rows do.
 */
object Mp3 {

  /** kbps by bitrate index 1..14, MPEG-1 Layer III. */
  private val BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  /** kbps by bitrate index 1..14, MPEG-2/2.5 (LSF) Layer III. */
  private val BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  private val SampleRateV1 = Array(44100, 48000, 32000)
  private val SampleRateV2 = Array(22050, 24000, 16000)
  private val SampleRateV25 = Array(11025, 12000, 8000)

  /** Frame metadata for one MPEG audio stream.
   *  @param version      1 for MPEG-1, 2 for MPEG-2, 25 for MPEG-2.5
   *  @param sampleRate   Hz (constant across frames by contract)
   *  @param channels     1 (mono) or 2 (any stereo mode)
   *  @param nFrames      physical frame count walked
   *  @param samples      nFrames × samples-per-frame (1152 / 576)
   *  @param totalBytes   sum of frame lengths (excludes ID3 prefix)
   *  @param bitrateSumKbps sum of per-frame bitrates (avg = sum/n)
   *  @param xingFrames   frame count declared by a Xing/Info or VBRI
   *                      header in the first frame, -1 if absent
   *  @param id3Size      bytes of ID3v2 prefix skipped (0 if none) */
  final case class Mp3Meta(version: Int, sampleRate: Int, channels: Int,
      nFrames: Int, samples: Long, totalBytes: Long, bitrateSumKbps: Long,
      xingFrames: Int, id3Size: Int)

  def isMp3(p: Array[Byte]): Boolean =
    p != null && p.length >= 3 &&
      ((p(0) == 'I' && p(1) == 'D' && p(2) == '3') ||
       (p.length >= 2 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xE0) == 0xE0))

  /** Named seam: Layer-III audio decode is NOT implemented — metadata
   *  triage only. Mirrors the reference's opaque-codec stance. */
  def decodeMp3Audio(p: Array[Byte]): (Int, Array[Float]) =
    throw new UnsupportedOperationException(
      "MP3 Layer-III audio decode not implemented: metadata walk only " +
        "(Mp3.mp3Meta / mm_mp3_meta); decode is a documented Codec seam " +
        "like H.264/WebP")

  /** Walk the whole stream and account every frame. */
  def mp3Meta(p: Array[Byte]): Mp3Meta = {
    require(isMp3(p), "not an MP3 payload (no ID3v2 prefix or frame sync)")
    var at = 0
    var id3Size = 0
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      // syncsafe 28-bit size, excludes the 10-byte header itself
      require((p(6) | p(7) | p(8) | p(9)) >= 0 &&
        ((p(6) & 0x80) | (p(7) & 0x80) | (p(8) & 0x80) | (p(9) & 0x80)) == 0,
        "bad ID3v2 syncsafe size")
      val sz = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
        ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
      id3Size = 10 + sz
      require(id3Size <= p.length, s"ID3v2 tag ($id3Size B) overruns payload")
      at = id3Size
    }
    var version = 0 // 1 | 2 | 25
    var sampleRate = 0
    var channels = 0
    var nFrames = 0
    var totalBytes = 0L
    var bitrateSum = 0L
    var xingFrames = -1
    while (at + 4 <= p.length) {
      require((p(at) & 0xFF) == 0xFF && (p(at + 1) & 0xE0) == 0xE0,
        f"lost MP3 frame sync at byte $at (0x${p(at) & 0xFF}%02X)")
      val b1 = p(at + 1) & 0xFF
      val b2 = p(at + 2) & 0xFF
      val b3 = p(at + 3) & 0xFF
      val ver = (b1 >> 3) & 3 match {
        case 3 => 1
        case 2 => 2
        case 0 => 25
        case _ => throw new IllegalArgumentException(
          s"reserved MPEG version at frame $nFrames")
      }
      val layer = (b1 >> 1) & 3 // 1=III 2=II 3=I
      require(layer == 1, s"MPEG Layer ${4 - layer} at frame $nFrames: " +
        "metadata walk supports Layer III (MP3) only — Layer I/II use a " +
        "different frame-length formula and are out of contract")
      val brIdx = (b2 >> 4) & 0xF
      require(brIdx != 0, s"free-format bitrate at frame $nFrames not supported")
      require(brIdx != 15, s"bad bitrate index at frame $nFrames")
      val srIdx = (b2 >> 2) & 3
      require(srIdx != 3, s"reserved samplerate index at frame $nFrames")
      val padding = (b2 >> 1) & 1
      val mode = (b3 >> 6) & 3
      val kbps = (if (ver == 1) BitrateV1 else BitrateV2)(brIdx)
      val sr = (if (ver == 1) SampleRateV1
                else if (ver == 2) SampleRateV2 else SampleRateV25)(srIdx)
      val ch = if (mode == 3) 1 else 2
      if (nFrames == 0) { version = ver; sampleRate = sr; channels = ch }
      else require(ver == version && sr == sampleRate && ch == channels,
        s"stream parameters changed mid-file at frame $nFrames " +
          s"(v$ver/$sr Hz/${ch}ch vs v$version/$sampleRate Hz/${channels}ch)")
      // Layer III: floor(samplesPerFrame/8 * bitrate / samplerate) + padding
      val perFrame = if (ver == 1) 144000L else 72000L
      val len = (perFrame * kbps / sr).toInt + padding
      require(len >= 4, s"degenerate frame length $len at frame $nFrames")
      require(at + len <= p.length,
        s"truncated MP3 frame $nFrames ($len B at $at, ${p.length} total)")
      if (nFrames == 0) {
        // Xing/Info sits after the side info; VBRI at a fixed 32-byte gap
        val side = if (ver == 1) { if (ch == 1) 17 else 32 }
                   else { if (ch == 1) 9 else 17 }
        val xat = at + 4 + side
        if (xat + 8 <= at + len &&
            ((p(xat) == 'X' && p(xat + 1) == 'i' && p(xat + 2) == 'n' && p(xat + 3) == 'g') ||
             (p(xat) == 'I' && p(xat + 1) == 'n' && p(xat + 2) == 'f' && p(xat + 3) == 'o'))) {
          val flags = be32(p, xat + 4)
          if ((flags & 1) != 0 && xat + 12 <= at + len)
            xingFrames = be32(p, xat + 8)
        } else {
          val vat = at + 4 + 32
          if (vat + 18 <= at + len && p(vat) == 'V' && p(vat + 1) == 'B' &&
              p(vat + 2) == 'R' && p(vat + 3) == 'I')
            xingFrames = be32(p, vat + 14)
        }
      }
      nFrames += 1
      totalBytes += len
      bitrateSum += kbps
      at += len
    }
    require(at == p.length,
      s"${p.length - at} trailing bytes after the last whole MP3 frame")
    require(nFrames > 0, "MP3 payload has no audio frames")
    val spf = if (version == 1) 1152L else 576L
    Mp3Meta(version, sampleRate, channels, nFrames, nFrames * spf,
      totalBytes, bitrateSum, xingFrames, id3Size)
  }

  private def be32(p: Array[Byte], at: Int): Int =
    ((p(at) & 0xFF) << 24) | ((p(at + 1) & 0xFF) << 16) |
      ((p(at + 2) & 0xFF) << 8) | (p(at + 3) & 0xFF)

  // --------------------------------------------------------------- encode

  /** Build a structurally-real MP3 stream (valid headers, zeroed audio
   *  payload — "structural" the way a fuzzing corpus is): optional
   *  ID3v2 prefix of `id3Content` bytes, first frame fixed 128 kbps
   *  mono MPEG-1 carrying a Xing header declaring the total frame
   *  count, then one frame per entry of `vbrKbps` (each a legal
   *  MPEG-1 Layer III bitrate). 44.1 kHz mono throughout. */
  def encodeMp3Structural(id3Content: Int, vbrKbps: Seq[Int]): Array[Byte] = {
    require(id3Content >= 0 && id3Content < (1 << 28), "bad ID3 content size")
    val o = new java.io.ByteArrayOutputStream(512)
    // ID3v2 prefix is always present (header + id3Content zero bytes);
    // pass 0 for the minimal 10-byte tag
    o.write('I'); o.write('D'); o.write('3')
    o.write(4); o.write(0); o.write(0) // v2.4.0, no flags
    o.write((id3Content >> 21) & 0x7F); o.write((id3Content >> 14) & 0x7F)
    o.write((id3Content >> 7) & 0x7F); o.write(id3Content & 0x7F)
    var pad = 0
    while (pad < id3Content) { o.write(0); pad += 1 }
    val nFrames = 1 + vbrKbps.length
    def writeFrame(kbps: Int, xing: Boolean): Unit = {
      val brIdx = BitrateV1.indexOf(kbps)
      require(brIdx > 0, s"$kbps kbps is not a legal MPEG-1 Layer III bitrate")
      val len = (144000L * kbps / 44100).toInt // no padding
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte
      f(1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
      f(2) = (brIdx << 4).toByte // 44100 (idx 0), no padding
      f(3) = 0xC0.toByte // mono
      if (xing) {
        val xat = 4 + 17 // mono MPEG-1 side info
        f(xat) = 'X'; f(xat + 1) = 'i'; f(xat + 2) = 'n'; f(xat + 3) = 'g'
        f(xat + 7) = 1 // flags: frames field present
        f(xat + 8) = ((nFrames >> 24) & 0xFF).toByte
        f(xat + 9) = ((nFrames >> 16) & 0xFF).toByte
        f(xat + 10) = ((nFrames >> 8) & 0xFF).toByte
        f(xat + 11) = (nFrames & 0xFF).toByte
      }
      o.write(f, 0, len)
    }
    writeFrame(128, xing = true)
    vbrKbps.foreach(writeFrame(_, xing = false))
    o.toByteArray
  }

  /** Legal MPEG-1 Layer III bitrate for a seed byte: index 1 + b mod 14. */
  def kbpsForSeed(b: Int): Int = BitrateV1(1 + ((b & 0xFF) % 14))
}
