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
 * version/samplerate indices, bad sync, truncated frames.
 *
 * AUDIO decode ([[decodeMp3]]) runs at the SILENCE-EXACT tier: the
 * frame walk, bit reservoir (main_data_begin back-pointers), side-info
 * parse, scfsi handling and MPEG-1 long-block scalefactor decode are
 * real and oracle-certified (`mm_mp3_decode`); empty-spectrum granules
 * reconstruct to exact silence through the whole chain. NAMED seams,
 * with the blocked/decidable boundary made explicit (r14, per the r13
 * verdict): the tier is DATA-BLOCKED, not design-blocked —
 *  - BLOCKED on ISO 11172-3 Annex B appendix data unavailable offline:
 *    the 32 big-value huffman code tables + linbits (Table B.7), the
 *    count1 quadruple tables (B.7 codes 32/33 — even table 33's
 *    reputed all-4-bit structure is appendix content, and faking it
 *    from memory is exactly what the no-fake-appendix-data rule
 *    forbids), and the 512-coefficient synthesis window (Table B.3).
 *    Any non-empty spectrum and any nonzero PCM sits behind these.
 *  - DECIDABLE from normative body text and already implemented: frame
 *    walk, reservoir, side info, scfsi, MPEG-1 long-block
 *    scalefactors, the empty-spectrum reconstruction chain
 *    (requantize → alias-reduce → IMDCT → overlap-add → synthesis are
 *    all exact on zeros regardless of window data).
 *  - DECIDABLE and still open (would NOT widen the hash-green surface
 *    without the tables above): short-block + LSF scalefactor layouts
 *    — pure body-text bit layouts, but every non-silence path they
 *    serve is huffman-blocked, so they stay unimplemented rather than
 *    untestable.
 * The swap-in point is [[decodeMp3]]'s named error sites; dropping in
 * the Annex-B data is a data change, not a code change — mirroring the
 * Vp8 probability-table seam. (reference keeps codecs behind opaque
 * guests: reference: host-go/engine/engine.go:1).
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

  /** Layer-III audio decode, SILENCE-EXACT TIER (the ADPCM
   *  constant-block precedent): real frame walk, bit reservoir
   *  (main_data_begin back-pointers into previous frames' main data),
   *  side-info parse, and long-block scalefactor decode — then an
   *  exact all-zero reconstruction for granules whose spectrum is
   *  empty (big_values = 0 and no count1 bits): zero spectrum →
   *  zero requant → zero IMDCT/overlap → zero polyphase output, every
   *  stage of which is exact without the spec's appendix data. NAMED
   *  seams (loud, enumerated in [[decodeMp3]]): the Annex-B huffman
   *  tables (any non-empty spectrum), the Annex-B.3 synthesis window
   *  (any nonzero PCM), short-block scalefactors, MPEG-2 LSF
   *  scalefactors. Returns (sampleRate, mono-mixed PCM). */
  def decodeMp3Audio(p: Array[Byte]): (Int, Array[Float]) = {
    val d = decodeMp3(p)
    (d.sampleRate, d.pcm)
  }

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
    writeAudioFrames(o, vbrKbps)
    o.toByteArray
  }

  /** Like [[encodeMp3Structural]] but with caller-supplied ID3v2 tag
   *  bytes (see [[encodeId3v2]]) — the tagged-corpus fixture shape. */
  def encodeMp3Tagged(id3: Array[Byte], vbrKbps: Seq[Int]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(id3.length + 512)
    o.write(id3, 0, id3.length)
    writeAudioFrames(o, vbrKbps)
    o.toByteArray
  }

  private def writeAudioFrames(o: java.io.ByteArrayOutputStream,
      vbrKbps: Seq[Int]): Unit = {
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
  }

  // ------------------------------------------------- ID3v2 text frames

  /** Encode an ID3v2.3/2.4 tag of text frames under one text encoding
   *  (0 = Latin-1; 1 = UTF-16 with BOM; v2.4 only: 2 = UTF-16BE,
   *  3 = UTF-8), plus `pad` zero bytes of padding — the id3.org
   *  informal standard, all normative body text. */
  def encodeId3v2(frames: Seq[(String, String)], version: Int, enc: Int,
      pad: Int = 0): Array[Byte] = {
    require(version == 3 || version == 4, "ID3v2.3/2.4 only")
    require(enc >= 0 && enc <= (if (version == 3) 1 else 3),
      s"text encoding $enc invalid for ID3v2.$version")
    require(pad >= 0, "negative padding")
    val body = new java.io.ByteArrayOutputStream(256)
    frames.foreach { case (fid, text) =>
      require(fid.length == 4 && fid.forall(c =>
        (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
        s"bad ID3 frame id '$fid'")
      val payload = enc match {
        case 0 => 0.toByte +:
          text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case 1 => Array[Byte](1, 0xFF.toByte, 0xFE.toByte) ++
          text.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        case 2 => 2.toByte +:
          text.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        case _ => 3.toByte +:
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      fid.foreach(c => body.write(c))
      val sz = payload.length
      if (version == 4) { // syncsafe frame size
        body.write((sz >> 21) & 0x7F); body.write((sz >> 14) & 0x7F)
        body.write((sz >> 7) & 0x7F); body.write(sz & 0x7F)
      } else { // v2.3: plain 32-bit big-endian
        body.write((sz >> 24) & 0xFF); body.write((sz >> 16) & 0xFF)
        body.write((sz >> 8) & 0xFF); body.write(sz & 0xFF)
      }
      body.write(0); body.write(0) // frame flags
      body.write(payload, 0, payload.length)
    }
    val content = body.toByteArray
    val total = content.length + pad
    require(total < (1 << 28), "ID3 tag too large for a syncsafe size")
    val o = new java.io.ByteArrayOutputStream(10 + total)
    o.write('I'); o.write('D'); o.write('3')
    o.write(version); o.write(0); o.write(0) // v2.x.0, no flags
    o.write((total >> 21) & 0x7F); o.write((total >> 14) & 0x7F)
    o.write((total >> 7) & 0x7F); o.write(total & 0x7F)
    o.write(content, 0, content.length)
    var i = 0
    while (i < pad) { o.write(0); i += 1 }
    o.toByteArray
  }

  /** Walk an ID3v2.3/2.4 tag (standalone or as an MP3 prefix) and
   *  return every TEXT frame (`T...` ids) as (frame id, decoded text),
   *  in tag order — the audio-corpus metadata triage tier (title
   *  TIT2, artist TPE1, album TALB, date TDRC/TYER, ...). All four
   *  declared text encodings decode; trailing NUL terminators strip;
   *  padding ends the walk. Loud NAMED failures: ID3v2.2 (3-byte frame
   *  ids — a different layout, named tier), unknown versions, frames
   *  overrunning the tag, malformed ids, undeclared text encodings.
   *
   *  100 TB shape: per-payload linear walk over the tag bytes only
   *  (the audio frames are never touched) — pure per-row CPU. */
  def id3TextFrames(p: Array[Byte]): Seq[(String, String)] = {
    require(p != null && p.length >= 10 &&
      p(0) == 'I' && p(1) == 'D' && p(2) == '3', "no ID3v2 tag")
    val major = p(3) & 0xFF
    if (major == 2) throw new IllegalArgumentException(
      "ID3v2.2 (3-byte frame ids) — named tier, not decoded")
    require(major == 3 || major == 4, s"unknown ID3v2.$major tag")
    require(((p(6) | p(7) | p(8) | p(9)) & 0x80) == 0,
      "bad ID3v2 syncsafe size")
    val size = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
      ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
    val end = 10 + size
    require(end <= p.length, s"ID3v2 tag ($end B) overruns payload")
    var at = 10
    if (((p(5) & 0xFF) & 0x40) != 0) { // extended header present
      require(at + 4 <= end, "truncated ID3v2 extended header")
      val ext =
        if (major == 4) // syncsafe, size includes its own 4 bytes
          ((p(at) & 0x7F) << 21) | ((p(at + 1) & 0x7F) << 14) |
            ((p(at + 2) & 0x7F) << 7) | (p(at + 3) & 0x7F)
        else // v2.3: plain size EXCLUDING the 4 size bytes
          4 + (((p(at) & 0xFF) << 24) | ((p(at + 1) & 0xFF) << 16) |
            ((p(at + 2) & 0xFF) << 8) | (p(at + 3) & 0xFF))
      require(ext >= 4 && at + ext <= end, "bad ID3v2 extended header size")
      at += ext
    }
    val out = Seq.newBuilder[(String, String)]
    var walking = true
    while (walking && at + 10 <= end && p(at) != 0) {
      val fid = new String(p, at, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
        s"malformed ID3 frame id '$fid' at byte $at")
      val sz =
        if (major == 4) {
          require(((p(at + 4) | p(at + 5) | p(at + 6) | p(at + 7)) & 0x80) == 0,
            s"bad syncsafe frame size in '$fid'")
          ((p(at + 4) & 0x7F) << 21) | ((p(at + 5) & 0x7F) << 14) |
            ((p(at + 6) & 0x7F) << 7) | (p(at + 7) & 0x7F)
        } else
          ((p(at + 4) & 0xFF) << 24) | ((p(at + 5) & 0xFF) << 16) |
            ((p(at + 6) & 0xFF) << 8) | (p(at + 7) & 0xFF)
      require(sz >= 0 && at + 10 + sz <= end,
        s"ID3 frame '$fid' ($sz B) overruns the tag")
      if (fid.charAt(0) == 'T' && sz >= 1) {
        val enc = p(at + 10) & 0xFF
        val cs = enc match {
          case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
          case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-led
          case 2 => java.nio.charset.StandardCharsets.UTF_16BE
          case 3 => java.nio.charset.StandardCharsets.UTF_8
          case other => throw new IllegalArgumentException(
            s"ID3 frame '$fid': undeclared text encoding $other")
        }
        val text = new String(p, at + 11, sz - 1, cs)
        // strip trailing NUL terminator(s)
        var cut = text.length
        while (cut > 0 && text.charAt(cut - 1) == '\u0000') cut -= 1
        out += ((fid, text.substring(0, cut)))
      }
      at += 10 + sz
      if (at >= end) walking = false
    }
    out.result()
  }

  /** Legal MPEG-1 Layer III bitrate for a seed byte: index 1 + b mod 14. */
  def kbpsForSeed(b: Int): Int = BitrateV1(1 + ((b & 0xFF) % 14))

  // -------------------------------------------------- Layer III decode

  /** MPEG-1 scalefac_compress → (slen1, slen2) (spec table B.5 — tiny,
   *  published in the normative text, not appendix data). */
  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // bit position
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  private final case class GranuleSide(part23: Int, bigValues: Int,
      globalGain: Int, scalefacCompress: Int, windowSwitching: Boolean,
      blockType: Int, preflag: Int, scalefacScale: Int, count1Table: Int)

  final case class Mp3Decoded(sampleRate: Int, channels: Int,
      pcm: Array[Float], scalefacSum: Long)

  /** Decode an MPEG-1 Layer III stream at the silence-exact tier (see
   *  [[decodeMp3Audio]]). `scalefacSum` is the sum of every decoded
   *  scalefactor — the oracle-checkable witness that the side-info /
   *  reservoir / scalefactor machinery read the right bits. */
  def decodeMp3(p: Array[Byte]): Mp3Decoded = {
    val meta = mp3Meta(p) // validates sync/params; names Layer/version tiers
    require(meta.version == 1,
      "MPEG-2/2.5 (LSF) scalefactor decode — named seam (different " +
        "scalefac_compress partitioning); MPEG-1 Layer III only")
    val ch = meta.channels
    var at = meta.id3Size
    var resBuf = new Array[Byte](math.max(4096, p.length))
    var resLen = 0
    var scalefacSum = 0L
    var frame = 0
    // per-channel granule-0 scalefactors of the CURRENT frame (for scfsi)
    val gr0Scf = Array.fill(ch)(new Array[Int](21))
    while (at + 4 <= p.length) {
      val b2 = p(at + 2) & 0xFF
      val brIdx = (b2 >> 4) & 0xF
      val padding = (b2 >> 1) & 1
      val kbps = BitrateV1(brIdx)
      val len = (144000L * kbps / meta.sampleRate).toInt + padding
      // protection_bit = 0 means a 16-bit CRC sits between the header
      // and the side info
      val crcLen = if ((p(at + 1) & 1) == 0) 2 else 0
      val sideLen = if (ch == 1) 17 else 32
      val sideAt = at + 4 + crcLen
      val side = new BitReader(
        java.util.Arrays.copyOfRange(p, sideAt, sideAt + sideLen))
      val mainDataBegin = side.bits(9)
      side.bits(if (ch == 1) 5 else 3) // private bits
      val scfsi = Array.fill(ch)(Array.fill(4)(side.bits(1) == 1))
      val grs = Array.fill(2, ch) {
        val part23 = side.bits(12)
        val bigValues = side.bits(9)
        val globalGain = side.bits(8)
        val sc = side.bits(4)
        val ws = side.bits(1) == 1
        var blockType = 0
        if (ws) {
          blockType = side.bits(2)
          side.bits(1) // mixed_block_flag
          side.bits(5); side.bits(5) // 2 table selects
          side.bits(3); side.bits(3); side.bits(3) // subblock gains
        } else {
          side.bits(5); side.bits(5); side.bits(5) // 3 table selects
          side.bits(4); side.bits(3) // region0/1 counts
        }
        val pre = side.bits(1)
        val sfScale = side.bits(1)
        val c1t = side.bits(1)
        GranuleSide(part23, bigValues, globalGain, sc, ws, blockType,
          pre, sfScale, c1t)
      }
      // main data joins the reservoir; this frame's granules start
      // mainDataBegin BYTES back from its own first main-data byte.
      // The reservoir is an amortized-growth array read in place — a
      // per-frame toByteArray copy would be O(frames²) on long streams.
      val frameMainStart = resLen
      val mainBytes = len - 4 - crcLen - sideLen
      if (resLen + mainBytes > resBuf.length) {
        var cap = resBuf.length
        while (cap < resLen + mainBytes) cap *= 2
        resBuf = java.util.Arrays.copyOf(resBuf, cap)
      }
      System.arraycopy(p, sideAt + sideLen, resBuf, resLen, mainBytes)
      resLen += mainBytes
      require(mainDataBegin <= frameMainStart,
        s"frame $frame main_data_begin $mainDataBegin reaches before " +
          "the reservoir start")
      val main = new BitReader(resBuf)
      main.pos = (frameMainStart - mainDataBegin) * 8
      var gr = 0
      while (gr < 2) {
        var c = 0
        while (c < ch) {
          val g = grs(gr)(c)
          val start = main.pos
          require(!(g.windowSwitching && g.blockType == 2),
            "short-block scalefactor layout — named seam (long blocks only)")
          val s1 = Slen1(g.scalefacCompress)
          val s2 = Slen2(g.scalefacCompress)
          val scf = new Array[Int](21)
          // scfsi groups (long blocks): bands 0-5, 6-10, 11-15, 16-20;
          // a set bit means granule 1 reuses granule 0's values
          val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
          var gi = 0
          while (gi < 4) {
            val (lo, hi) = groups(gi)
            val reuse = gr == 1 && scfsi(c)(gi)
            var i = lo
            while (i < hi) {
              val slen = if (i <= 10) s1 else s2
              scf(i) =
                if (reuse) gr0Scf(c)(i)
                else if (slen == 0) 0
                else main.bits(slen)
              if (!reuse) scalefacSum += scf(i)
              i += 1
            }
            gi += 1
          }
          if (gr == 0) System.arraycopy(scf, 0, gr0Scf(c), 0, 21)
          val used = main.pos - start
          require(used <= g.part23,
            s"scalefactors ($used bits) overran part2_3_length ${g.part23}")
          if (g.part23 > used) {
            // the remaining bits are huffman spectrum (big_values pairs +
            // count1 quadruples) — the Annex-B code tables are the seam
            throw new UnsupportedOperationException(
              s"frame $frame gr $gr: ${g.part23 - used} bits of huffman " +
                "spectrum — named seam: MPEG-1 Annex-B huffman tables " +
                "(and the B.3 synthesis window) unavailable offline; " +
                "empty-spectrum (silent) granules decode exactly")
          }
          // empty spectrum: requant(0) = 0, stereo/alias no-ops on zero,
          // IMDCT of zeros is zeros, overlap-add state stays zero, and
          // the polyphase synthesis of a zero V vector is zero for ANY
          // window — the one tier exact without Annex B.3.
          c += 1
        }
        gr += 1
      }
      frame += 1
      at += len
    }
    Mp3Decoded(meta.sampleRate, ch,
      new Array[Float](frame * 1152), scalefacSum)
  }

  /** Fixture-grade SILENT MPEG-1 Layer III encoder: `nFrames` mono
   *  frames at 128 kbps / 32 kHz (exact 576-byte frames, no padding).
   *  Every granule codes big_values = 0 and part2_3_length = exactly
   *  its scalefactor bits, with scalefactor values
   *  `(seed + 7·granuleIdx + band) mod 2^slen` — so the decode output
   *  is silence and [[decodeMp3]]'s `scalefacSum` is a closed form an
   *  oracle replays. Frames after the first park their scalefactor
   *  bits at the END of the PREVIOUS frame's main data and point back
   *  via main_data_begin — the bit-reservoir path runs for real. */
  def encodeMp3Silence(seed: Long, scalefacCompress: Int,
      nFrames: Int = 2, scfsiAll: Boolean = false): Array[Byte] = {
    require(scalefacCompress >= 0 && scalefacCompress < 16)
    require(nFrames >= 1)
    val s1 = Slen1(scalefacCompress)
    val s2 = Slen2(scalefacCompress)
    val grBits = 11 * s1 + 10 * s2
    val frameLen = 576 // 144000*128/32000, no padding
    val mainLen = frameLen - 4 - 17
    // with scfsi all-set, granule 1 reuses granule 0's values: no bits
    val codedGranules = if (scfsiAll) 1 else 2
    val resvBytes = (codedGranules * grBits + 7) / 8 // one frame's data

    final class BitWriter(n: Int) {
      val b = new Array[Byte](n)
      var pos = 0
      def bits(v: Int, k: Int): Unit = {
        var i = k - 1
        while (i >= 0) {
          if (((v >> i) & 1) != 0) b(pos >> 3) = (b(pos >> 3) |
            (1 << (7 - (pos & 7)))).toByte
          pos += 1
          i -= 1
        }
      }
    }

    def scfBits(w: BitWriter, frameIdx: Int): Unit = {
      var gr = 0
      while (gr < codedGranules) {
        val g = frameIdx * 2 + gr
        var i = 0
        while (i < 21) {
          val slen = if (i <= 10) s1 else s2
          if (slen > 0)
            w.bits(((seed + 7 * g + i) % (1L << slen)).toInt, slen)
          i += 1
        }
        gr += 1
      }
    }

    val out = new java.io.ByteArrayOutputStream(nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      out.write(0xFF); out.write(0xFB) // MPEG-1 Layer III, no CRC
      out.write((0x09 << 4) | (2 << 2)) // 128 kbps (idx 9), 32 kHz (idx 2)
      out.write(0xC0) // mono
      val side = new BitWriter(17)
      side.bits(if (f == 0) 0 else resvBytes, 9) // main_data_begin
      side.bits(0, 5) // private
      side.bits(if (scfsiAll) 0xF else 0, 4) // scfsi
      var gr = 0
      while (gr < 2) {
        // granule 1 under all-set scfsi reuses granule 0: zero bits
        side.bits(if (gr == 1 && scfsiAll) 0 else grBits, 12)
        side.bits(0, 9) // big_values
        side.bits(210, 8) // global_gain (unused on empty spectrum)
        side.bits(scalefacCompress, 4)
        side.bits(0, 1) // window_switching = 0 (long block)
        side.bits(0, 5); side.bits(0, 5); side.bits(0, 5) // table selects
        side.bits(0, 4); side.bits(0, 3) // region counts
        side.bits(0, 1); side.bits(0, 1); side.bits(0, 1) // pre/scale/c1t
        gr += 1
      }
      out.write(side.b, 0, 17)
      val main = new BitWriter(mainLen)
      if (f == 0) scfBits(main, 0) // frame 0's own granules, inline
      if (f + 1 < nFrames) {
        // park the NEXT frame's granule bits at the end of this main data
        val tail = new BitWriter(resvBytes)
        scfBits(tail, f + 1)
        System.arraycopy(tail.b, 0, main.b, mainLen - resvBytes, resvBytes)
      }
      out.write(main.b, 0, mainLen)
      f += 1
    }
    out.toByteArray
  }
}
