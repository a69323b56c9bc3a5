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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_image_meta"      -> (imageMeta _),
    "mm_image_features"  -> (imageFeatures _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_audio_features"  -> (audioFeatures _),
    "mm_phash_verify"    -> (phashVerify _)
  )

  override val oracles: Map[String, String] = Map(
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
