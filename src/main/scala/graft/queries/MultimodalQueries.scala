package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Multimodal-plumbing queries. Media payloads are derived deterministically
 * from `documents.text` (UTF-8 bytes) since the container ships no real
 * media; the decode is the documented STUB (`Multimodal.FakeCodec`), the
 * Spark plumbing (binary columns, batched mapPartitions, schema evolution,
 * partition-local explode) is real.
 *
 * `mm_image_meta` is fully oracle-checked: the fake decoder's dimensions
 * are a pure function of payload byte length, which DuckDB recomputes with
 * `octet_length(encode(text))`. Pixel/feature/frame outputs are
 * JVM-codec-specific → rows-only checks, semantics pinned in MultimodalSpec.
 */
object MultimodalQueries extends QueryProvider {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fakeMediaFromText(
      T(s, dir, "documents").select("doc_id", "text"), "text", "image")
      .drop("text")

  /** decode → typed meta struct; flattened for the oracle. */
  private def imageMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImage(media(s, dir), "payload")
      .select(
        col("doc_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.channels").cast("long").as("channels"),
        col("meta.format").as("format"))

  private val imageMetaSql =
    """SELECT doc_id,
      |  CAST(8 + octet_length(encode(text)) % 24 AS BIGINT) AS width,
      |  CAST(8 + (octet_length(encode(text)) // 7) % 24 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  'fake' AS format
      |FROM documents""".stripMargin

  /** decode → resize → per-channel features; the payload/pixels are gone
   *  from the output — only the 9-float feature vector survives. */
  private def imageFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(
      Multimodal.resizeImage(
        Multimodal.decodeImage(media(s, dir), "payload"), 8, 8))
      .select(col("doc_id"), col("modality"),
        size(col("features")).cast("long").as("n_features"))

  // Feature values are codec-specific; the *shape* contract (9 = 3 channels
  // × mean/min/max) is SQL-checkable.
  private val imageFeaturesSql =
    """SELECT doc_id, 'image' AS modality, CAST(9 AS BIGINT) AS n_features
      |FROM documents""".stripMargin

  /** Video-style frame sampling: payload split into n_frames, every 2nd
   *  frame emitted as a row — partition-local 1:N. Frame count and sizes
   *  are byte-arithmetic → fully oracle-checkable. */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    val video = media(s, dir)
      .withColumn("n_frames", (pmod(col("doc_id"), lit(7)) + lit(2)).cast("int"))
    Multimodal.sampleFrames(video, "payload", "n_frames", stride = 2)
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"))
  }

  private val frameSampleSql =
    """WITH v AS (
      |  SELECT doc_id, octet_length(encode(text)) AS nb,
      |         doc_id % 7 + 2 AS n_frames
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, nb, n_frames,
      |         greatest(nb // n_frames, 1) AS frame_size,
      |         unnest(range(0, n_frames, 2)) AS frame_idx
      |  FROM v
      |)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(greatest(0, least(frame_size, nb - frame_idx * frame_size)) AS BIGINT)
      |    AS frame_bytes
      |FROM f""".stripMargin

  /** audio decode → features; stub sample count is byte arithmetic →
   *  oracle-checkable, waveform-derived values pinned in the spec. */
  private def audioFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioFeatures(
      Multimodal.decodeAudio(
        Multimodal.fakeMediaFromText(
          T(s, dir, "documents").select("doc_id", "text"), "text", "audio")
          .drop("text"), "payload"))
      .select(col("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"))

  private val audioFeaturesSql =
    """SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate,
      |  CAST(256 + octet_length(encode(text)) % 1024 AS BIGINT) AS n_samples
      |FROM documents""".stripMargin

  /** Image near-dup via perceptual hash: decode → aHash signature →
   *  4×16-bit pigeonhole blocking → exact hamming ≤ 3 pairs — the text
   *  simhash machinery verbatim over image signatures. Production shape
   *  (bench board): the whole chain in one query. */
  private def phashDedup(s: SparkSession, dir: String): DataFrame = {
    // The signature table feeds BOTH sides of the candidate join; persist
    // it so each payload is decoded/pooled once, not once per side (the
    // bench's per-query hygiene unpersists it afterwards). In production
    // the signatures are an ingest-time artifact (the mm_phash_verify
    // shape) and this cache is a written table.
    val sigs = Multimodal.imagePhash(media(s, dir), "payload", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Dedup.simHashFromSignatures(sigs, maxHamming = 3)
  }

  /** Cross-engine certification: the signature VALUES are codec-internal
   *  (exact aHash bits pinned in MultimodalSpec), but GIVEN the
   *  materialized signature table the search is exactly replayable —
   *  DuckDB brute-forces all-pairs 64-bit hamming and must reach the
   *  identical pair set, certifying that pigeonhole blocking loses
   *  nothing at hamming ≤ 3 and that the bit_count math agrees. */
  private def phashVerify(s: SparkSession, dir: String): DataFrame = {
    Scratch.materialize(s, dir, "phash_sigs",
      Multimodal.imagePhash(media(s, dir), "payload", "doc_id"))
    graft.operators.Dedup.simHashFromSignatures(
      s.read.parquet(Scratch.dir(dir, "phash_sigs")), maxHamming = 3)
  }

  private val phashVerifySql =
    s"""WITH sigs AS (
       |  SELECT doc, simhash
       |  FROM read_parquet('${Scratch.oraclePath("phash_sigs")}/*.parquet')
       |)
       |SELECT a.doc AS doc_a, b.doc AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc < b.doc
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  /** REAL BMP round-trip, oracle-certified: per doc, 24 RGB bytes from
   *  md5(text)‖md5(text‖'x') become a real 4×2 24-bpp BMP
   *  (`withBmpPayload`), the payload decodes through the magic-sniffing
   *  codec (`SniffCodec` — so the hash also certifies the sniff chose
   *  the REAL path: format='bmp', not 'fake'), and the pixel tensor
   *  folds back to the exact byte sum DuckDB recomputes from the hex
   *  digests. Certifies encoder layout (BGR, bottom-up, row padding),
   *  decoder, and float quantization round-trip in one hash. */
  private def bmpRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val rgb = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("rgb"))
    Multimodal.decodeImage(
        Multimodal.withBmpPayload(rgb, "rgb", w = 4, h = 2).drop("rgb"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val bmpRoundtripSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |)
      |SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'bmp' AS format, CAST(sum(byte) AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL PNG round-trip — the same certification as [[bmpRoundtrip]]
   *  but through a COMPRESSED codec: the 24 md5-derived RGB bytes
   *  become a real zlib-deflated 4×2 truecolor PNG (`withPngPayload`),
   *  the magic-sniffing codec picks the real PNG path (format='png'
   *  certifies the sniff), and the decoded tensor — after chunk-CRC
   *  verification, Inflater decompression and filter reconstruction —
   *  folds back to the exact byte sum DuckDB recomputes from the hex
   *  digests. One hash certifies encoder, zlib round-trip, filter
   *  logic, and float quantization. */
  private def pngRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val rgb = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("rgb"))
    Multimodal.decodeImage(
        Multimodal.withPngPayload(rgb, "rgb", w = 4, h = 2).drop("rgb"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val pngRoundtripSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |)
      |SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'png' AS format, CAST(sum(byte) AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL JPEG round-trip — the first DCT-COMPRESSED codec with a
   *  hash-green oracle: 16 md5 bytes become solid 8×8 tiles of a 32×32
   *  grayscale image, encoded through the real baseline JPEG path
   *  (FDCT → unit quant → huffman entropy coding with RESTART MARKERS
   *  every 5 MCUs) and decoded back through the magic-sniffing codec
   *  (format='jpeg' certifies the sniff). Solid tiles are DC-only
   *  blocks, which survive unit-quant JPEG exactly (see [[
   *  graft.operators.Jpeg]]), so DuckDB replays the decoded byte sum
   *  from the hex digest — the hash certifies huffman tables, bit
   *  stuffing, DC prediction, RST resync and the IDCT in one row set.
   *  General AC/color behavior is spec-pinned against ImageIO. */
  private def jpegRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val seed = T(s, dir, "documents").select(col("doc_id"),
      expr("unhex(md5(text))").as("seed"))
    Multimodal.decodeImage(
        Multimodal.withTiledJpegPayload(seed, "seed", tiles = 4,
          restartMcus = 5).drop("seed"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val jpegRoundtripSql =
    """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      |d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 17) r
      |)
      |SELECT doc_id, CAST(32 AS INTEGER) AS width,
      |  CAST(32 AS INTEGER) AS height, 'jpeg' AS format,
      |  CAST(sum(byte) * 64 AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL color 4:2:0 JPEG round-trip — closes the r11 gap where
   *  `Jpeg.encodeRgb`/`subsample420` had spec cover but no oracle row.
   *  12 md5 bytes become 4 solid 16x16 color MCUs of a 32x32 image
   *  encoded at quality=100 (unit quant) WITH chroma subsampling; the
   *  solid-MCU carve-out survives the 2x2 chroma mean exactly, so the
   *  only lossy steps are the two documented integer color conversions,
   *  which DuckDB replays verbatim (floor(x+0.5) = Java math.round,
   *  clamp to [0,255]). One hash certifies RGB->YCbCr, the 4:2:0 MCU
   *  interleave, three DC predictor chains, both chroma huffman
   *  tables, upsampling and YCbCr->RGB. */
  private def jpeg420Roundtrip(s: SparkSession, dir: String): DataFrame = {
    val seed = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(md5(text)), 1, 12)").as("seed"))
    Multimodal.decodeImage(
        Multimodal.withMcuColorJpegPayload(seed, "seed", mcus = 2)
          .drop("seed"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val jpeg420RoundtripSql =
    """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      |d AS (
      |  SELECT doc_id, (r.range - 1) // 3 AS mcu, (r.range - 1) % 3 AS ch,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 13) r
      |), c AS (
      |  -- DOUBLE casts matter: a bare 0.299 literal is DECIMAL in DuckDB
      |  -- (exact base-10) and diverges from the engine's IEEE doubles at
      |  -- half boundaries; every product below must be double-typed
      |  SELECT doc_id, mcu,
      |    CAST(max(CASE WHEN ch = 0 THEN byte END) AS DOUBLE) AS r,
      |    CAST(max(CASE WHEN ch = 1 THEN byte END) AS DOUBLE) AS g,
      |    CAST(max(CASE WHEN ch = 2 THEN byte END) AS DOUBLE) AS b
      |  FROM d GROUP BY doc_id, mcu
      |), yc AS (
      |  SELECT doc_id,
      |    GREATEST(0, LEAST(255, CAST(floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5) AS BIGINT))) AS yy,
      |    GREATEST(0, LEAST(255, CAST(floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5) AS BIGINT))) AS cb,
      |    GREATEST(0, LEAST(255, CAST(floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5) AS BIGINT))) AS cr
      |  FROM c
      |), p AS (
      |  SELECT doc_id,
      |    GREATEST(0, LEAST(255, CAST(floor(yy + 1.402 * CAST(cr - 128 AS DOUBLE) + 0.5) AS BIGINT)))
      |    + GREATEST(0, LEAST(255, CAST(floor(yy - 0.344136 * CAST(cb - 128 AS DOUBLE) - 0.714136 * CAST(cr - 128 AS DOUBLE) + 0.5) AS BIGINT)))
      |    + GREATEST(0, LEAST(255, CAST(floor(yy + 1.772 * CAST(cb - 128 AS DOUBLE) + 0.5) AS BIGINT))) AS rgbsum
      |  FROM yc
      |)
      |SELECT doc_id, CAST(32 AS INTEGER) AS width,
      |  CAST(32 AS INTEGER) AS height, 'jpeg' AS format,
      |  CAST(sum(rgbsum) * 256 AS BIGINT) AS pix_byte_sum
      |FROM p GROUP BY doc_id""".stripMargin

  /** The 18th composition flagship: REAL codecs feeding the near-dup
   *  machinery end-to-end. A heterogeneous corpus (per-row BMP/PNG/JPEG,
   *  `withMixedImagePayload`) decodes through the sniffing codec, every
   *  decoded tensor collapses to an aHash signature
   *  (`imagePhash(SniffCodec)` — REAL pixels now, not the stub), the
   *  signature table materializes (the stored-index production shape),
   *  and the text pipeline's 4×16-bit pigeonhole blocking mines
   *  hamming ≤ 3 near-dups from it verbatim. DuckDB brute-forces
   *  all-pairs hamming over the same materialized table, so the hash
   *  certifies decode → signature → blocking recall in one row set.
   *
   *  100 TB shape: payloads never shuffle (phash is one batched
   *  mapPartitions collapsing each blob to 8 bytes); the pair join runs
   *  on 16-bit band keys over the slim signature table. */
  private def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    val seeded = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("seed"),
      pmod(col("doc_id"), lit(3)).as("kind"))
    val media = Multimodal.withMixedImagePayload(seeded, "seed", "kind")
      .drop("seed", "kind")
    Scratch.materialize(s, dir, "media_phash_sigs",
      Multimodal.imagePhash(media, "payload", "doc_id",
        codec = Multimodal.SniffCodec))
    graft.operators.Dedup.simHashFromSignatures(
      s.read.parquet(Scratch.dir(dir, "media_phash_sigs")), maxHamming = 3)
  }

  private val mediaDedupSql =
    s"""WITH sigs AS (
       |  SELECT doc, simhash
       |  FROM read_parquet('${Scratch.oraclePath("media_phash_sigs")}/*.parquet')
       |)
       |SELECT a.doc AS doc_a, b.doc AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc < b.doc
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  /** REAL TIFF round-trip exercising BOTH byte orders on the oracle
   *  path: even docs encode II (little-endian), odd docs MM
   *  (big-endian); both decode through the sniffing codec to the same
   *  pixel bytes, so one hash certifies header/IFD parsing under either
   *  endianness plus the strip assembly (format='tiff' certifies the
   *  sniff). TIFF is lossless — same md5 byte-sum oracle as BMP/PNG. */
  private def tiffRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val rgb = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("rgb"))
    val le = Multimodal.withTiffPayload(
      rgb.where(pmod(col("doc_id"), lit(2)) === 0), "rgb", w = 4, h = 2)
    val be = Multimodal.withTiffPayload(
      rgb.where(pmod(col("doc_id"), lit(2)) === 1), "rgb", w = 4, h = 2,
      bigEndian = true)
    Multimodal.decodeImage(le.union(be).drop("rgb"), "payload",
        codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val tiffRoundtripSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |)
      |SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'tiff' AS format, CAST(sum(byte) AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL GIF round-trip through real LZW compression: 24 md5 bytes
   *  become an 8-color palette, the 4×2 frame indexes colors 0..7 in
   *  order, the payload round-trips through `Gif.encodeGif`'s
   *  variable-width LZW and the sniffing decode — GIF is lossless for
   *  paletted data, so the decoded tensor folds back to the exact byte
   *  sum DuckDB recomputes from the hex digests (format='gif' certifies
   *  the sniff picked the real LZW path). */
  private def gifRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("concat(substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24), " +
        "unhex('0001020304050607'))").as("src"))
    Multimodal.decodeImage(
        Multimodal.withGifPayload(src, "src", w = 4, h = 2, colors = 8)
          .drop("src"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val gifRoundtripSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |)
      |SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'gif' AS format, CAST(sum(byte) AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL LOSSLESS WEBP (VP8L) round-trip — four arms over IDENTICAL
   *  4×2 pixels (24 md5 bytes, alpha 255), each exercising a different
   *  bitstream feature through `SniffCodec`: literal coding,
   *  subtract-green transform, predictor transform (mode 7), and an
   *  8-color color-indexing transform with sub-byte bundling. VP8L is
   *  lossless, so all four arms must fold to the SAME byte sum DuckDB
   *  recomputes from the hex digests — a slip in any transform inverse,
   *  the prefix-code machinery, or the palette unbundling flips exactly
   *  that arm's sum. Lossy VP8 and animated WebP stay NAMED seams. */
  private def webpRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("src"))
    val arms = Seq("rgb", "green", "pred", "pal").map { arm =>
      Multimodal.decodeImage(
          Multimodal.withWebpPayload(src, "src", arm).drop("src"),
          "payload", codec = Multimodal.SniffCodec)
        .select(col("doc_id"), lit(arm).as("arm"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.format").as("format"),
          org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
            .as("pix_byte_sum"))
    }
    arms.reduce(_ unionAll _)
  }

  private val webpRoundtripSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |), s AS (
      |  SELECT doc_id, CAST(sum(byte) + 8 * 255 AS BIGINT) AS pix_byte_sum
      |  FROM d GROUP BY doc_id
      |)
      |SELECT doc_id, a.arm, CAST(4 AS INTEGER) AS width,
      |  CAST(2 AS INTEGER) AS height, 'webp' AS format, pix_byte_sum
      |FROM s, (VALUES ('rgb'), ('green'), ('pred'), ('pal')) a(arm)""".stripMargin

  /** REAL LOSSY VP8 WEBP — the other WebP coding tier, through the
   *  full key-frame pipeline (bool decode of header/modes/tokens,
   *  dequant, iWHT, iDCT, DC intra prediction, skip propagation): a
   *  32×16 solid frame per document whose Y2/chroma DC coefficients
   *  (spanning every DCT token and all six extra-bit categories, both
   *  signs) and quantizer index derive from doc columns. VP8 decode is
   *  DETERMINISTIC integer math, so DuckDB replays the exact
   *  dequant→iWHT→iDCT→predict chain in closed form (floor shifts via
   *  the shift-non-negative // trick) and the whole-plane sum certifies
   *  constancy —
   *  i.e. skip-coded DC prediction propagated to every macroblock.
   *  Probability-table conformance stays the NAMED seam ([[Vp8]]). */
  private def webpLossy(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("unhex(concat(lpad(hex((doc_id % 141) + 58), 2, '0')," +
        "lpad(hex((n_chars % 25) + 116), 2, '0')," +
        "lpad(hex((doc_id % 9) + 124), 2, '0')," +
        "lpad(hex(doc_id % 128), 2, '0')))").as("src"))
    Multimodal.decodeImage(
        Multimodal.withVp8SolidPayload(src, "src").drop("src"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        expr("CAST(round(pixels[0] * 255) AS BIGINT)").as("y0"),
        expr("CAST(round(pixels[1] * 255) AS BIGINT)").as("u0"),
        expr("CAST(round(pixels[2] * 255) AS BIGINT)").as("v0"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val webpLossySql = {
    val dcq = graft.operators.Vp8.Vp8Tables.DcQLookup.mkString("[", ", ", "]")
    s"""WITH p AS (
      |  SELECT doc_id,
      |    (doc_id % 141) - 70 AS wy,
      |    (n_chars % 25) - 12 AS wu,
      |    (doc_id % 9) - 4 AS wv,
      |    CAST(doc_id % 128 AS INTEGER) AS qi
      |  FROM documents
      |), q AS (
      |  SELECT doc_id, wy, wu, wv, ($dcq)[qi + 1] AS dcq FROM p
      |), v AS (
      |  -- Scala >> floors; DuckDB // truncates toward zero. Shift every
      |  -- dividend non-negative (+32768, a multiple of 8) so they agree.
      |  SELECT doc_id,
      |    LEAST(255, GREATEST(0,
      |      128 + ((((wy * (dcq * 2) + 3 + 32768) // 8 - 4096)
      |              + 4 + 32768) // 8 - 4096))) AS y0,
      |    LEAST(255, GREATEST(0,
      |      128 + ((wu * LEAST(132, dcq) + 4 + 32768) // 8 - 4096))) AS u0,
      |    LEAST(255, GREATEST(0,
      |      128 + ((wv * LEAST(132, dcq) + 4 + 32768) // 8 - 4096))) AS v0
      |  FROM q
      |)
      |SELECT doc_id, CAST(32 AS INTEGER) AS width,
      |  CAST(16 AS INTEGER) AS height, 'yuv420' AS format,
      |  CAST(y0 AS BIGINT) AS y0, CAST(u0 AS BIGINT) AS u0,
      |  CAST(v0 AS BIGINT) AS v0,
      |  CAST(512 * (y0 + u0 + v0) AS BIGINT) AS pix_byte_sum
      |FROM v""".stripMargin
  }

  /** LOSSY + ALPH WEBP — the r14 closure of r13's named rejection:
   *  each document carries a VP8X + ALPH + VP8 still
   *  ([[graft.operators.Multimodal.withWebpAlphaPayload]]) whose alpha
   *  plane is a row-linear ramp stored under a per-doc spec filter
   *  (none/horizontal/vertical/gradient) and compression (raw vs
   *  headerless VP8L); the oracle replays the VP8 solid closed form
   *  for luma AND the exact ramp sum for alpha — a filter-inversion or
   *  green-channel slip flips `pix_byte_sum`. 100 TB shape: per-row
   *  decode in the batched mapPartitions, no shuffle. */
  private def webpAlpha(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("unhex(concat(lpad(hex((doc_id % 141) + 58), 2, '0')," +
        "lpad(hex(n_chars % 128), 2, '0')," +
        "lpad(hex(doc_id % 9), 2, '0')," +
        "lpad(hex(doc_id % 8), 2, '0')))").as("src"))
    Multimodal.decodeImage(
        Multimodal.withWebpAlphaPayload(src, "src").drop("src"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        expr("CAST(round(pixels[3] * 255) AS BIGINT)").as("a_first"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val webpAlphaSql =
    """WITH p AS (
      |  SELECT doc_id,
      |    (doc_id % 141) - 70 AS wy,
      |    n_chars % 128 AS a0,
      |    doc_id % 9 AS st
      |  FROM documents
      |), v AS (
      |  -- VP8 solid closed form at q = 0 (dcq = 4, y2dc = 8); shift
      |  -- dividends non-negative so DuckDB // matches Scala >>
      |  SELECT doc_id,
      |    LEAST(255, GREATEST(0,
      |      128 + ((((wy * 8 + 3 + 32768) // 8 - 4096)
      |              + 4 + 32768) // 8 - 4096))) AS y0,
      |    a0, st
      |  FROM p
      |)
      |SELECT doc_id, CAST(16 AS INTEGER) AS width,
      |  CAST(16 AS INTEGER) AS height, 'yuva420' AS format,
      |  CAST(a0 AS BIGINT) AS a_first,
      |  -- 256·y0 + 256·128·2 (flat chroma) + the alpha ramp sum
      |  CAST(256 * y0 + 65536 + 256 * a0 + 1920 * st AS BIGINT)
      |    AS pix_byte_sum
      |FROM v""".stripMargin

  /** ANIMATED WEBP 1:N frame explode — the WebP sibling of
   *  `mm_gif_frames`: 24 md5 bytes become a 3-frame VP8X/ANIM/ANMF
   *  animation (`withAnimatedWebpPayload`) whose frames exercise
   *  sub-canvas placement, replace compositing and
   *  dispose-to-background; `decodeWebpFrames` composites each frame
   *  on the 4×2 canvas. Fixed geometry keeps every composited frame's
   *  RGBA byte sum linear in per-position byte sums, replayed exactly
   *  by DuckDB — a placement, dispose, or per-frame VP8L slip flips a
   *  frame's sum. */
  private def webpFrames(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("src"))
    Multimodal.decodeWebpFrames(
        Multimodal.withAnimatedWebpPayload(src, "src").drop("src"),
        "payload")
      .select(col("doc_id"), col("frame_idx"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val webpFramesSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id, r.range AS pos,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |), c AS (
      |  SELECT doc_id, sum(byte) AS all24,
      |    sum(CASE WHEN pos <= 3 THEN byte ELSE 0 END) AS s1_3,
      |    sum(CASE WHEN pos <= 6 THEN byte ELSE 0 END) AS s1_6,
      |    sum(CASE WHEN pos BETWEEN 7 AND 12 THEN byte ELSE 0 END) AS s7_12,
      |    sum(CASE WHEN pos >= 22 THEN byte ELSE 0 END) AS s22_24
      |  FROM d GROUP BY doc_id
      |)
      |SELECT doc_id, CAST(f.fi AS INTEGER) AS frame_idx,
      |  CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'webp' AS format,
      |  CAST(CASE f.fi
      |    WHEN 0 THEN all24 + 2040
      |    WHEN 1 THEN all24 + 2040 - s7_12 + s1_6
      |    ELSE all24 + 1530 - s1_3 - s7_12 + s22_24
      |  END AS BIGINT) AS pix_byte_sum
      |FROM c, (VALUES (0), (1), (2)) f(fi)""".stripMargin

  /** 16-BIT + GRAY+ALPHA PNG tiers (the last two PNG color/depth
   *  families, previously NAMED rejections): arm 'png16' round-trips
   *  12 big-endian u16 samples (24 md5 bytes) through a 2×2 depth-16
   *  truecolor PNG — the decode normalizes v/65535, and
   *  floor(x·65535 + 0.5) recovers every u16 exactly (float32 relative
   *  error ≪ half a unit), so the quantized sum equals the BE-pair sum
   *  DuckDB computes from the hex digests; arm 'graya' round-trips 8
   *  (g, a) pairs through a 4×2 color-type-4 PNG whose decode expands
   *  to (g,g,g,a) RGBA, so the byte sum is Σ(3g + a). Both arms ride
   *  `SniffCodec`, certifying dispatch + both new decode paths. */
  private def pngTiers(s: SparkSession, dir: String): DataFrame = {
    val hiSrc = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("src"))
    val hi = Multimodal.decodeImage(
        Multimodal.withPng16Payload(hiSrc, "src", w = 2, h = 2).drop("src"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"), lit("png16").as("arm"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledFloorHalfSum(col("pixels"), 65535.0)
          .as("pix_q_sum"))
    val gaSrc = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(md5(text)), 1, 16)").as("src"))
    val ga = Multimodal.decodeImage(
        Multimodal.withGrayAlphaPngPayload(gaSrc, "src", w = 4, h = 2)
          .drop("src"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"), lit("graya").as("arm"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_q_sum"))
    hi.unionAll(ga)
  }

  private val pngTiersSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id, r.range AS pos,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 25) r
      |), hi AS (
      |  SELECT doc_id, 'png16' AS arm, CAST(2 AS INTEGER) AS width,
      |    CAST(2 AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels,
      |    'png' AS format,
      |    CAST(sum(CASE WHEN pos % 2 = 1 THEN 256 * byte ELSE byte END)
      |      AS BIGINT) AS pix_q_sum
      |  FROM d GROUP BY doc_id
      |), ga AS (
      |  SELECT doc_id, 'graya' AS arm, CAST(4 AS INTEGER) AS width,
      |    CAST(2 AS INTEGER) AS height, CAST(4 AS INTEGER) AS channels,
      |    'png' AS format,
      |    CAST(sum(CASE WHEN pos % 2 = 1 THEN 3 * byte ELSE byte END)
      |      AS BIGINT) AS pix_q_sum
      |  FROM d WHERE pos <= 16 GROUP BY doc_id
      |)
      |SELECT * FROM hi UNION ALL SELECT * FROM ga""".stripMargin

  /** MP3 METADATA WALK — audio-corpus triage over structurally-real
   *  MP3 streams: 9 md5 bytes per document size an ID3v2 prefix and
   *  pick 8 VBR bitrates behind a Xing frame (`withMp3Payload`), and
   *  `Multimodal.mp3Meta` walks every frame header (bitrate/samplerate
   *  tables, exact frame-length arithmetic, Xing extraction, ID3
   *  syncsafe skip). All outputs are integer-exact functions of the
   *  seed bytes, so DuckDB replays the walk — a wrong bitrate table
   *  entry or frame-length formula desyncs the stream or flips the
   *  sums. Full Layer-III audio decode stays a named seam
   *  (`Mp3.decodeMp3Audio`). */
  private def mp3Meta(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(md5(text)), 1, 9)").as("seed"))
    Multimodal.mp3Meta(
        Multimodal.withMp3Payload(src, "seed").drop("seed"),
        "payload")
  }

  private val mp3MetaSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) AS hx FROM documents
      |), d AS (
      |  SELECT doc_id, r.range AS pos,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 10) r
      |), k AS (
      |  SELECT doc_id, pos, byte,
      |    CASE 1 + byte % 14
      |      WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
      |      WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
      |      WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
      |      WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps
      |  FROM d
      |)
      |SELECT doc_id,
      |  CAST(1 AS INTEGER) AS mpeg_version,
      |  CAST(44100 AS INTEGER) AS sample_rate,
      |  CAST(1 AS INTEGER) AS channels,
      |  CAST(9 AS INTEGER) AS n_frames,
      |  CAST(9 * 1152 AS BIGINT) AS samples,
      |  CAST((144000 * 128) // 44100
      |    + sum(CASE WHEN pos >= 2 THEN (144000 * kbps) // 44100 ELSE 0 END)
      |    AS BIGINT) AS stream_bytes,
      |  CAST(128 + sum(CASE WHEN pos >= 2 THEN kbps ELSE 0 END) AS BIGINT)
      |    AS bitrate_sum_kbps,
      |  CAST(9 AS INTEGER) AS xing_frames,
      |  CAST(10 + min(CASE WHEN pos = 1 THEN byte % 64 END) AS INTEGER)
      |    AS id3_size
      |FROM k GROUP BY doc_id""".stripMargin

  /** PNG TEXTUAL METADATA — the third leg of the metadata-triage trio
   *  (ID3 audio, EXIF JPEG, PNG text): each document's payload is a
   *  real 4x4 PNG carrying Title/Author/Software chunks spread across
   *  ALL FOUR chunk kinds (tEXt, zTXt, iTXt plain, iTXt deflated) by
   *  doc arithmetic; `pngTextChunks` walks them CRC-checked and
   *  `decodePng` re-decodes the same payload (img_w) to prove the
   *  extra chunks don't disturb the pixel path. The oracle predicts
   *  every field from document columns. */
  private def pngText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, source, lang) =>
        val rgb = Array.fill(4 * 4 * 3)(((id * 11 + 7) % 256).toByte)
        val png = Multimodal.Png.encodePngWithText(4, 4, rgb, Seq(
          ("Title", s"Doc $id", (id % 4).toInt),
          ("Author", source, ((id + 1) % 4).toInt),
          ("Software", "graft " + lang, ((id + 2) % 4).toInt)))
        val got = Multimodal.Png.pngTextChunks(png).toMap
        val w = Multimodal.Png.decodePng(png)._1
        (id, got.getOrElse("Title", ""), got.getOrElse("Author", ""),
          got.getOrElse("Software", ""), got.size.toLong, w.toLong)
      }
      .toDF("doc_id", "title", "author", "software", "n_text", "img_w")
  }

  private val pngTextSql =
    """SELECT doc_id,
      |  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
      |  source AS author,
      |  'graft ' || lang AS software,
      |  CAST(3 AS BIGINT) AS n_text,
      |  CAST(4 AS BIGINT) AS img_w
      |FROM documents""".stripMargin

  /** PDF TEXT EXTRACTION — the DOCUMENT-triage codec (a real crawl is
   *  a few percent application/pdf and corpus pipelines text-extract
   *  those like HTML): each document becomes a real two-page PDF
   *  through [[graft.operators.Pdf.encodePdf]] (catalog/pages tree,
   *  per-page FlateDecode content streams on even ids and raw on odd —
   *  both filter paths exercised — Helvetica, /Info /Title, exact
   *  xref offsets), and [[graft.operators.Pdf.extractText]] walks it
   *  back: linear object scan, balanced dicts, capped inflate, BT…ET
   *  show-operator tokenizer with full literal-string escapes. The
   *  oracle predicts page count, title, op count and the EXACT
   *  extracted text from document columns (the ASCII sanitize rule is
   *  replayed with the same regex on both engines) — an offset, dict,
   *  inflate or escape slip breaks the hash. 100 TB shape: per-payload
   *  linear decode, narrow map, nothing but slim text rows downstream. */
  private def pdfText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text0, source) =>
        val clean = text0.replaceAll("[^ -~]", "")
        val p1 = clean.take(40)
        val p2 = s"Doc $id by $source"
        val pdf = graft.operators.Pdf.encodePdf(Seq(p1, p2), s"T-$id",
          compress = id % 2 == 0)
        val (pages, title, ops, txt) = graft.operators.Pdf.extractText(pdf)
        (id, pages.toLong, title, ops.toLong, txt,
          graft.operators.Pdf.isPdf(pdf))
      }
      .toDF("doc_id", "n_pages", "title", "n_ops", "text", "is_pdf")
  }

  private val pdfTextSql =
    """SELECT doc_id, CAST(2 AS BIGINT) AS n_pages,
      |  'T-' || CAST(doc_id AS VARCHAR) AS title,
      |  CAST(2 AS BIGINT) AS n_ops,
      |  substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 40)
      |    || chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR) || ' by '
      |    || source AS text,
      |  true AS is_pdf
      |FROM documents""".stripMargin

  /** CRAWL→PDF FLAGSHIP — the DOCUMENT complement of
   *  `pipeline_crawl_media`: each page rides a real .warc.gz whose
   *  HTTP response body is an `application/pdf` payload
   *  ([[graft.operators.Pdf.encodePdf]], filter path alternating by
   *  doc parity), [[graft.operators.Warc.recordsBinary]] surfaces the
   *  RAW body bytes (a text transcode would destroy the binary xref
   *  region), the magic sniff gates on `%PDF-`, and
   *  [[graft.operators.Pdf.extractText]] recovers page count, /Info
   *  title and the exact text — all predicted by the oracle from
   *  document columns through the same ASCII-sanitize regex. This is
   *  the triage chain a corpus operator runs on the few percent of a
   *  crawl that is PDF. 100 TB shape: per-payload linear decode end to
   *  end; archive blobs and PDF bytes never shuffle, the slim
   *  extracted rows do. */
  private def crawlPdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val date = "2026-01-01T00:00:00Z"
    val archives = T(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text0, source) =>
        val clean = text0.replaceAll("[^ -~]", "").take(60)
        val pdf = graft.operators.Pdf.encodePdf(Seq(clean),
          s"D$id-$source", compress = id % 2 == 1)
        val W = graft.operators.Warc
        val gz = W.encodeWarcGz(Seq(
          (Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> date),
            "software: graft\r\n".getBytes(
              java.nio.charset.StandardCharsets.UTF_8)),
          (Seq("WARC-Type" -> "response",
            "WARC-Target-URI" -> s"https://p.example.com/doc/$id.pdf",
            "WARC-Date" -> date),
            W.httpResponseBytes(pdf, "application/pdf"))))
        (id, gz)
      }.toDF("doc_id", "payload")
    graft.operators.Warc.recordsBinary(archives, "payload")
      .filter(col("warc_type") === "response" &&
        col("content_type") === "application/pdf")
      .select(col("doc_id"), col("body")).as[(Long, Array[Byte])]
      .map { case (id, body) =>
        require(graft.operators.Pdf.isPdf(body), s"doc $id: not a pdf")
        val (pages, title, ops, txt) = graft.operators.Pdf.extractText(body)
        (id, pages.toLong, title, ops.toLong, txt)
      }.toDF("doc_id", "n_pages", "title", "n_ops", "text")
  }

  private val crawlPdfSql =
    """SELECT doc_id, CAST(1 AS BIGINT) AS n_pages,
      |  'D' || CAST(doc_id AS VARCHAR) || '-' || source AS title,
      |  CAST(1 AS BIGINT) AS n_ops,
      |  substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 60) AS text
      |FROM documents""".stripMargin

  /** CRAWL→MEDIA FLAGSHIP — crawl bytes feeding the MULTIMODAL side
   *  (the binary complement of `pipeline_crawl_corpus`'s text chain):
   *  each document's .warc.gz wraps an HTTP response whose body is a
   *  REAL two-tone 16x16 BMP (left/right halves at doc-parity-chosen
   *  gray levels), [[graft.operators.Warc.recordsBinary]] surfaces the
   *  RAW body bytes (no text transcode), and
   *  [[Multimodal.imagePhash]] (SniffCodec dispatch) collapses each to
   *  its 64-bit aHash. The two-tone construction makes the signature
   *  an EXACT closed form — each pooled cell equals its half's gray,
   *  the mean splits them, and the bright half's bit pattern is
   *  0xF0/0x0F per row byte — so the oracle predicts the hash value
   *  itself, certifying decode + pooling + threshold + bit packing
   *  through real crawl framing. 100 TB shape: per-row until the
   *  single slim projection; blobs never shuffle. */
  private def crawlMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val archives = T(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val (a, b) = if (id % 2 == 0) (100, 180) else (180, 20)
        val rgb = new Array[Byte](16 * 16 * 3)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val v = (if (x < 8) a else b).toByte
            val at = (y * 16 + x) * 3
            rgb(at) = v; rgb(at + 1) = v; rgb(at + 2) = v
            x += 1
          }
          y += 1
        }
        val bmp = Multimodal.Containers.encodeBmp(16, 16, rgb)
        val uri = s"https://img.example.com/$id.bmp"
        val gz = graft.operators.Warc.encodeWarcGz(Seq(
          (Seq("WARC-Type" -> "warcinfo",
            "WARC-Date" -> "2026-01-01T00:00:00Z"),
            "software: graft\r\n".getBytes(
              java.nio.charset.StandardCharsets.UTF_8)),
          (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
            "WARC-Date" -> "2026-01-01T00:00:00Z"),
            graft.operators.Warc.httpResponse(bmp, "image/bmp"))))
        (id, gz)
      }.toDF("doc_id", "payload")
    val images = graft.operators.Warc.recordsBinary(archives, "payload")
      .where(col("content_type").startsWith("image/") &&
        col("http_status") === 200)
      .select(col("doc_id"), col("content_type"), col("body"))
    Multimodal.imagePhash(images.select(col("doc_id"), col("body")),
        "body", "doc_id", codec = Multimodal.SniffCodec)
      .select(col("doc").as("doc_id"), col("simhash"))
  }

  private val crawlMediaSql =
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1085102592571150096
      |            ELSE 1085102592571150095 END AS BIGINT) AS simhash
      |FROM documents""".stripMargin

  /** EXIF METADATA WALK — the image-triage sibling of the ID3 tier:
   *  each document's payload is a REAL 8x8 baseline JPEG with an APP1
   *  Exif segment spliced after SOI (orientation, make/model, original
   *  timestamp, declared pixel dims; byte order alternates II/MM by doc
   *  parity). `Exif.exifMeta` walks segments + both IFDs without
   *  entropy-decoding; `Jpeg.decodeJpeg` then decodes the SAME payload
   *  to prove the splice preserves the image (img_w column). The
   *  oracle predicts every field from document columns. */
  private def jpegExif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, source, lang, nChars) =>
        val gray = Array.fill(64)(((id * 37 + 100) % 256).toByte)
        val tagged = graft.operators.Exif.withExif(
          graft.operators.Jpeg.encodeGray(8, 8, gray),
          orientation = (id % 8 + 1).toInt,
          make = "graft-" + source, model = "M-" + lang,
          dateTime = s"2026:01:0${id % 9 + 1} 12:00:00",
          pixelX = nChars.toInt, pixelY = (id % 1000).toInt,
          bigEndian = id % 2 == 0)
        val m = graft.operators.Exif.exifMeta(tagged)
        val w = graft.operators.Jpeg.decodeJpeg(tagged)._1
        (id, m.orientation.toLong, m.make, m.model, m.dateTime,
          m.pixelX.toLong, m.pixelY.toLong, w.toLong)
      }
      .toDF("doc_id", "orientation", "make", "model", "taken_at",
        "px", "py", "img_w")
  }

  private val jpegExifSql =
    """SELECT doc_id,
      |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
      |  'graft-' || source AS make,
      |  'M-' || lang AS model,
      |  '2026:01:0' || CAST(doc_id % 9 + 1 AS VARCHAR) || ' 12:00:00'
      |    AS taken_at,
      |  CAST(n_chars AS BIGINT) AS px,
      |  CAST(doc_id % 1000 AS BIGINT) AS py,
      |  CAST(8 AS BIGINT) AS img_w
      |FROM documents""".stripMargin

  /** ID3v2 TEXT-FRAME EXTRACTION — the tagged-audio triage tier
   *  (title/artist/album/date without touching a single audio frame):
   *  each document carries a real MP3 whose ID3v2 tag holds four text
   *  frames built from its columns, spread across BOTH tag versions
   *  (v2.3 / v2.4 by doc parity) and ALL FOUR text encodings (Latin-1,
   *  UTF-16+BOM, UTF-16BE, UTF-8 — v2.3 rows use its two legal ones),
   *  with per-doc padding. `Mp3.id3TextFrames` walks the tag; the
   *  oracle predicts the decoded text from the columns — any
   *  frame-size arithmetic, encoding, or padding bug desyncs the walk
   *  or corrupts the text. 100 TB shape: per-payload linear tag walk,
   *  audio bytes untouched. */
  private def mp3Id3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, source, lang) =>
        val version = if (id % 2 == 0) 3 else 4
        // decorrelated from the version parity: v2.4 rows (odd ids) walk
        // id/2 over 0..3 so UTF-16BE (enc 2) is actually exercised here,
        // not just in MultimodalSpec
        val enc = (if (version == 3) (id / 2) % 2 else (id / 2) % 4).toInt
        val tag = graft.operators.Mp3.encodeId3v2(Seq(
          "TIT2" -> s"Doc $id", "TPE1" -> source, "TALB" -> lang,
          "TDRC" -> (2020 + id % 5).toString),
          version, enc, pad = (id % 32).toInt)
        val mp3 = graft.operators.Mp3.encodeMp3Tagged(tag,
          Seq(64, 96))
        val got = graft.operators.Mp3.id3TextFrames(mp3).toMap
        (id, got.getOrElse("TIT2", ""), got.getOrElse("TPE1", ""),
          got.getOrElse("TALB", ""), got.getOrElse("TDRC", ""),
          got.size.toLong,
          graft.operators.Mp3.mp3Meta(mp3).nFrames.toLong)
      }
      .toDF("doc_id", "title", "artist", "album", "rec_date",
        "n_text_frames", "n_audio_frames")
  }

  private val mp3Id3Sql =
    """SELECT doc_id,
      |  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
      |  source AS artist,
      |  lang AS album,
      |  CAST(2020 + doc_id % 5 AS VARCHAR) AS rec_date,
      |  CAST(4 AS BIGINT) AS n_text_frames,
      |  CAST(3 AS BIGINT) AS n_audio_frames
      |FROM documents""".stripMargin

  /** MP3 LAYER-III DECODE, silence-exact tier — real MPEG-1 frames
   *  (side info, bit reservoir with main_data_begin back-pointers into
   *  the previous frame's main data, long-block scalefactor coding
   *  spanning all 16 scalefac_compress slen pairs) decoded through
   *  [[Mp3.decodeMp3]]: empty-spectrum granules reconstruct to exact
   *  silence, and the decoded-scalefactor sum is the oracle-checkable
   *  witness that the reservoir/side-info/scalefactor machinery read
   *  exactly the right bits. Huffman spectrum + the synthesis window
   *  stay NAMED seams ([[Mp3]] Scaladoc). */
  private def mp3Decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 16).cast("int").as("sc"))
      .as[(Long, Int)]
      .map { case (id, sc) =>
        val d = graft.operators.Mp3.decodeMp3(
          graft.operators.Mp3.encodeMp3Silence(id, sc))
        val maxAbs =
          if (d.pcm.isEmpty) 0L
          else math.round(d.pcm.map(math.abs).max * 255f).toLong
        (id, d.sampleRate.toLong, d.channels.toLong, d.pcm.length.toLong,
          maxAbs, d.scalefacSum)
      }
      .toDF("doc_id", "sample_rate", "channels", "n_samples",
        "max_abs_pcm", "scalefac_sum")
  }

  private val mp3DecodeSql =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS sc FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    ([1,1,1,1,8,2,2,2,4,4,4,8,8,8,16,16])[sc + 1] AS m1,
      |    ([1,2,4,8,1,2,4,8,2,4,8,2,4,8,4,8])[sc + 1] AS m2
      |  FROM p
      |), v AS (
      |  SELECT doc_id,
      |    (doc_id + 7 * g.range + b.range)
      |      % (CASE WHEN b.range <= 10 THEN m1 ELSE m2 END) AS scf
      |  FROM s, range(0, 4) g, range(0, 21) b
      |)
      |SELECT doc_id,
      |  CAST(32000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(2304 AS BIGINT) AS n_samples,
      |  CAST(0 AS BIGINT) AS max_abs_pcm,
      |  CAST(sum(scf) AS BIGINT) AS scalefac_sum
      |FROM v GROUP BY doc_id""".stripMargin

  /** ANIMATED GIF 1:N frame explode — the GIF sibling of
   *  `mm_avi_frames`: 24 md5 bytes become an 8-color global palette,
   *  `withAnimatedGifPayload` writes a real 4-frame GIF89a whose frames
   *  exercise transparency plus all three disposal methods, and
   *  `decodeGifFrames` composites each frame on the logical screen.
   *  Because the fixture's geometry is fixed, every composited frame's
   *  byte sum is a linear combination of per-color palette sums that
   *  DuckDB replays exactly from the hex digests — a disposal or
   *  transparency slip shows up as a wrong frame sum. */
  private def gifFrames(s: SparkSession, dir: String): DataFrame = {
    val src = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("pal"))
    Multimodal.decodeGifFrames(
        Multimodal.withAnimatedGifPayload(src, "pal").drop("pal"),
        "payload")
      .select(col("doc_id"), col("frame_idx"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val gifFramesSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS hx FROM documents
      |), d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte, (r.range - 1) // 3 AS color
      |  FROM h, range(1, 25) r
      |), c AS (
      |  SELECT doc_id, sum(byte) AS all24,
      |    sum(CASE WHEN color = 0 THEN byte ELSE 0 END) AS c0,
      |    sum(CASE WHEN color = 1 THEN byte ELSE 0 END) AS c1,
      |    sum(CASE WHEN color = 4 THEN byte ELSE 0 END) AS c4,
      |    sum(CASE WHEN color = 5 THEN byte ELSE 0 END) AS c5,
      |    sum(CASE WHEN color = 7 THEN byte ELSE 0 END) AS c7
      |  FROM d GROUP BY doc_id
      |)
      |SELECT doc_id, CAST(f.fi AS INTEGER) AS frame_idx,
      |  CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  'gif' AS format,
      |  CAST(CASE f.fi WHEN 0 THEN all24
      |                 WHEN 1 THEN all24 - c1 + c0
      |                 WHEN 2 THEN all24 - c7 + c4
      |                 ELSE all24 - c7 + c5 END AS BIGINT) AS pix_byte_sum
      |FROM c, (VALUES (0), (1), (2), (3)) f(fi)""".stripMargin

  /** Heterogeneous-corpus decode — the production shape of the real
   *  codecs: ONE binary column whose per-row format cycles
   *  BMP / truecolor PNG / JPEG / PALETTE PNG (bit-depth-4 PLTE lookup)
   *  / Adam7-INTERLACED PNG (`withMixedImagePayload`), ONE
   *  `decodeImage(SniffCodec)` pass that must magic-dispatch per row.
   *  The oracle replays format, dims and byte sum per arm from the hex
   *  digests (the palette arm joins pixel indices back to PLTE bytes),
   *  so the hash certifies the dispatch AND all five decode paths in a
   *  single row set — a wrong sniff shows up as a wrong format string
   *  or a fake-codec byte sum, a de-interlace slip as a wrong sum. */
  private def mixedCodecs(s: SparkSession, dir: String): DataFrame = {
    val seeded = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')))), 1, 24)")
        .as("seed"),
      pmod(col("doc_id"), lit(5)).as("kind"))
    Multimodal.decodeImage(
        Multimodal.withMixedImagePayload(seeded, "seed", "kind")
          .drop("seed"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"), col("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val mixedCodecsSql =
    """WITH h AS (
      |  SELECT doc_id, doc_id % 5 AS kind,
      |    md5(text) || md5(text || 'x') AS hx
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, kind,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte, r.range AS pos
      |  FROM h, range(1, 25) r
      |), base AS (
      |  SELECT doc_id, kind,
      |    CAST(sum(byte) AS BIGINT) AS all24,
      |    CAST(sum(CASE WHEN pos <= 16 THEN byte ELSE 0 END) AS BIGINT)
      |      AS first16
      |  FROM d GROUP BY doc_id, kind
      |), pal AS (
      |  -- palette arm: pixel i (pos <= 8) selects PLTE entry byte % 8,
      |  -- whose RGB bytes sit at positions 3*(byte%8)+1 .. +3
      |  SELECT px.doc_id, CAST(sum(e.byte) AS BIGINT) AS psum
      |  FROM d px JOIN d e ON e.doc_id = px.doc_id
      |    AND e.pos >= 3 * (px.byte % 8) + 1
      |    AND e.pos <= 3 * (px.byte % 8) + 3
      |  WHERE px.pos <= 8
      |  GROUP BY px.doc_id
      |)
      |SELECT b.doc_id, b.kind,
      |  CAST(CASE WHEN b.kind = 2 THEN 32 ELSE 4 END AS INTEGER) AS width,
      |  CAST(CASE WHEN b.kind = 2 THEN 32 ELSE 2 END AS INTEGER) AS height,
      |  CASE b.kind WHEN 0 THEN 'bmp' WHEN 2 THEN 'jpeg' ELSE 'png' END
      |    AS format,
      |  CAST(CASE b.kind WHEN 2 THEN 64 * b.first16
      |    WHEN 3 THEN pal.psum
      |    ELSE b.all24 END AS BIGINT) AS pix_byte_sum
      |FROM base b LEFT JOIN pal ON pal.doc_id = b.doc_id""".stripMargin

  /** REAL WAV round-trip, same discipline: 16 md5 bytes → 8 LE PCM16
   *  samples → a real mono WAV → sniffed decode → Σ round(sample·32768)
   *  equals the signed-16 sum DuckDB recomputes from the hex digest. */
  private def wavRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pcm = T(s, dir, "documents").select(col("doc_id"),
      expr("unhex(md5(text))").as("pcm"))
    Multimodal.decodeAudio(
        Multimodal.withWavPayload(pcm, "pcm", sampleRate = 16000).drop("pcm"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"), col("sample_rate"),
        size(col("samples")).cast("long").as("n_samples"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("samples"), 32768.0)
          .as("sample_sum"))
  }

  private val wavRoundtripSql =
    """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      |d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[4 * r.range - 3 : 4 * r.range - 3]) - 1)
      |    + (strpos('0123456789abcdef', hx[4 * r.range - 2 : 4 * r.range - 2]) - 1)
      |    + 256 * (16 * (strpos('0123456789abcdef',
      |        hx[4 * r.range - 1 : 4 * r.range - 1]) - 1)
      |      + (strpos('0123456789abcdef', hx[4 * r.range : 4 * r.range]) - 1))
      |      AS u16
      |  FROM h, range(1, 9) r
      |)
      |SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
      |  CAST(8 AS BIGINT) AS n_samples,
      |  CAST(sum(CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
      |    AS BIGINT) AS sample_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL compressed-audio round-trip through IMA ADPCM: 16 md5 bytes
   *  become 8 LE int16 values, each a CONSTANT 9-sample ADPCM block —
   *  the shape the lossy codec reproduces EXACTLY (block headers carry
   *  the value verbatim, zero-nibbles hold the predictor still) — so
   *  DuckDB replays Σ round(sample·32768) = 9 × Σ signed16 from the
   *  hex digest. The hash certifies block layout, nibble packing and
   *  the step/index reconstruction; general waveforms are spec-bounded. */
  private def adpcmRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val seed = T(s, dir, "documents").select(col("doc_id"),
      expr("unhex(md5(text))").as("seed"))
    Multimodal.decodeAudio(
        Multimodal.withConstantBlockAdpcmPayload(seed, "seed",
          sampleRate = 16000).drop("seed"),
        "payload", codec = Multimodal.SniffCodec)
      .select(col("doc_id"), col("sample_rate"),
        size(col("samples")).cast("long").as("n_samples"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("samples"), 32768.0)
          .as("sample_sum"))
  }

  private val adpcmRoundtripSql =
    """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      |d AS (
      |  SELECT doc_id,
      |    16 * (strpos('0123456789abcdef',
      |      hx[4 * r.range - 3 : 4 * r.range - 3]) - 1)
      |    + (strpos('0123456789abcdef', hx[4 * r.range - 2 : 4 * r.range - 2]) - 1)
      |    + 256 * (16 * (strpos('0123456789abcdef',
      |        hx[4 * r.range - 1 : 4 * r.range - 1]) - 1)
      |      + (strpos('0123456789abcdef', hx[4 * r.range : 4 * r.range]) - 1))
      |      AS u16
      |  FROM h, range(1, 9) r
      |)
      |SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
      |  CAST(72 AS BIGINT) AS n_samples,
      |  CAST(9 * sum(CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
      |    AS BIGINT) AS sample_sum
      |FROM d GROUP BY doc_id""".stripMargin

  /** REAL AVI round-trip: 36 md5-derived RGB bytes become three 2×2
   *  frames in a real RIFF/AVI container (`withAviPayload`), the
   *  payload decodes through `decodeVideoFrames` (RIFF tree walk,
   *  avih dims, DIB frame unpacking), and each frame's pixel tensor
   *  folds back to the byte sum DuckDB recomputes per frame index
   *  from the hex digests. */
  private def aviFrames(s: SparkSession, dir: String): DataFrame = {
    val rgb = T(s, dir, "documents").select(col("doc_id"),
      expr("substring(unhex(concat(md5(text), md5(concat(text, 'x')), " +
        "md5(concat(text, 'y')))), 1, 36)").as("rgb"))
    Multimodal.decodeVideoFrames(
        Multimodal.withAviPayload(rgb, "rgb", w = 2, h = 2, nFrames = 3)
          .drop("rgb"),
        "payload")
      .select(col("doc_id"), col("frame_idx"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        org.apache.spark.sql.graft.ScaledRoundSum.scaledRoundSum(col("pixels"), 255.0)
          .as("pix_byte_sum"))
  }

  private val aviFramesSql =
    """WITH h AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') || md5(text || 'y')
      |    AS hx
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, CAST((r.range - 1) // 12 AS INTEGER) AS frame_idx,
      |    16 * (strpos('0123456789abcdef',
      |      hx[2 * r.range - 1 : 2 * r.range - 1]) - 1)
      |    + (strpos('0123456789abcdef', hx[2 * r.range : 2 * r.range]) - 1)
      |      AS byte
      |  FROM h, range(1, 37) r
      |)
      |SELECT doc_id, frame_idx, CAST(2 AS INTEGER) AS width,
      |  CAST(2 AS INTEGER) AS height, 'avi' AS format,
      |  CAST(sum(byte) AS BIGINT) AS pix_byte_sum
      |FROM d GROUP BY 1, 2""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_avi_frames"      -> (aviFrames _),
    "mm_bmp_roundtrip"   -> (bmpRoundtrip _),
    "mm_png_roundtrip"   -> (pngRoundtrip _),
    "mm_jpeg_roundtrip"  -> (jpegRoundtrip _),
    "mm_jpeg420_roundtrip" -> (jpeg420Roundtrip _),
    "mm_mixed_codecs"    -> (mixedCodecs _),
    "mm_gif_roundtrip"   -> (gifRoundtrip _),
    "mm_gif_frames"      -> (gifFrames _),
    "mm_mp3_meta"        -> (mp3Meta _),
    "mm_mp3_id3"         -> (mp3Id3 _),
    "mm_jpeg_exif"       -> (jpegExif _),
    "pipeline_crawl_media" -> (crawlMedia _),
    "pipeline_crawl_pdf"   -> (crawlPdf _),
    "mm_png_text"        -> (pngText _),
    "mm_pdf_text"        -> (pdfText _),
    "mm_mp3_decode"      -> (mp3Decode _),
    "mm_png_tiers"       -> (pngTiers _),
    "mm_webp_roundtrip"  -> (webpRoundtrip _),
    "mm_webp_lossy"      -> (webpLossy _),
    "mm_webp_alpha"      -> (webpAlpha _),
    "mm_webp_frames"     -> (webpFrames _),
    "mm_tiff_roundtrip"  -> (tiffRoundtrip _),
    "mm_adpcm_roundtrip" -> (adpcmRoundtrip _),
    "pipeline_media_dedup" -> (mediaDedup _),
    "mm_wav_roundtrip"   -> (wavRoundtrip _),
    "mm_image_meta"      -> (imageMeta _),
    "mm_image_features"  -> (imageFeatures _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_audio_features"  -> (audioFeatures _),
    "mm_phash_verify"    -> (phashVerify _)
  )

  override val oracles: Map[String, String] = Map(
    "mm_avi_frames"      -> aviFramesSql,
    "mm_bmp_roundtrip"   -> bmpRoundtripSql,
    "mm_png_roundtrip"   -> pngRoundtripSql,
    "mm_jpeg_roundtrip"  -> jpegRoundtripSql,
    "mm_jpeg420_roundtrip" -> jpeg420RoundtripSql,
    "mm_mixed_codecs"    -> mixedCodecsSql,
    "mm_gif_roundtrip"   -> gifRoundtripSql,
    "mm_gif_frames"      -> gifFramesSql,
    "mm_mp3_meta"        -> mp3MetaSql,
    "mm_mp3_id3"         -> mp3Id3Sql,
    "mm_jpeg_exif"       -> jpegExifSql,
    "pipeline_crawl_media" -> crawlMediaSql,
    "pipeline_crawl_pdf"   -> crawlPdfSql,
    "mm_png_text"        -> pngTextSql,
    "mm_pdf_text"        -> pdfTextSql,
    "mm_mp3_decode"      -> mp3DecodeSql,
    "mm_png_tiers"       -> pngTiersSql,
    "mm_webp_roundtrip"  -> webpRoundtripSql,
    "mm_webp_lossy"      -> webpLossySql,
    "mm_webp_alpha"      -> webpAlphaSql,
    "mm_webp_frames"     -> webpFramesSql,
    "mm_tiff_roundtrip"  -> tiffRoundtripSql,
    "mm_adpcm_roundtrip" -> adpcmRoundtripSql,
    "pipeline_media_dedup" -> mediaDedupSql,
    "mm_wav_roundtrip"   -> wavRoundtripSql,
    "mm_image_meta"      -> imageMetaSql,
    "mm_image_features"  -> imageFeaturesSql,
    "mm_frame_sample"    -> frameSampleSql,
    "mm_audio_features"  -> audioFeaturesSql,
    "mm_phash_verify"    -> phashVerifySql
  )

  override val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_phash_dedup"     -> (phashDedup _)
  )
}
