package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (north-star requirement; the reference's
  * analog is the figure/PNG pipeline, SURVEY.md §2.10: images as opaque
  * payloads + typed metadata).
  *
  * Media payloads are opaque BINARY columns beside a typed metadata
  * struct. Decode/feature-extraction runs batched per partition via
  * `mapPartitions` over a typed Dataset — the Scala analog of a
  * vectorized pandas-UDF stage: per-partition (not per-row) dispatch,
  * so a real decoder would amortize model/codec initialization across
  * the batch with a lazily-initialized per-executor instance.
  *
  * DECODE IS A STUB: no image/audio codec ships in this environment,
  * so [[StubDecoder.decode]] derives deterministic pseudo-features from
  * the payload bytes. The Spark-side plumbing — binary schema, batch
  * shape, partition-wise dispatch, feature schema — is real and tested;
  * swapping in a true codec changes only the body of `decode`.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      checksum: String, width: Long, height: Long, n_frames: Long)

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for image/audio bytes), format
    * round-robins over pseudo-modalities. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      element_at(
        array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
    )

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * A real implementation would decode the image/audio here. */
  object StubDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.media.length.toLong
      val checksum = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(row.media).map("%02x".format(_)).mkString
      }
      MediaFeatures(
        doc_id = row.doc_id,
        format = row.format,
        n_bytes = n,
        checksum = checksum,
        width = n % 640,
        height = (n * 7) % 480,
        n_frames = n / 100 + 1,
      )
    }
  }

  /** Batched decode stage: one decoder dispatch per partition. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir)
      .transform(graft.Parallelism.ensure(spark))
      .as[MediaRow]
    media.mapPartitions { batch =>
      // a real codec would be lazily initialized HERE, once per batch
      batch.map(StubDecoder.decode)
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** Oracle SQL for [[decodeFeatures]] — possible precisely because the
    * stub is deterministic byte arithmetic; a reminder that the
    * *plumbing* is what this operator verifies. */
  def decodeFeaturesSql: String = """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(strlen(text) % 640 AS BIGINT) AS width,
           CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
           CAST(strlen(text) // 100 + 1 AS BIGINT) AS n_frames
    FROM documents ORDER BY doc_id"""

  /** Resize stage (STUB — real pixel resampling needs a codec): given
    * decoded (width, height) metadata, compute the aspect-preserving
    * fit into a target box and the scale factor — the metadata half of
    * an image-resize operator, as exact integer/rational arithmetic so
    * it oracle-checks. A real resize would add a mapPartitions stage
    * transforming the payload with these parameters. */
  def resizeFit(spark: SparkSession, dir: String, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val feats = decodeFeatures(spark, dir)
      // stub dims can be 0 (n_bytes % 640 == 0); clamp to 1 like a
      // real decoder would reject empty frames
      .select(col("doc_id"), col("format"),
        greatest(col("width"), lit(1L)).as("w"),
        greatest(col("height"), lit(1L)).as("h"))
    feats.select(
      col("doc_id"), col("format"), col("w"), col("h"),
      least(lit(maxW) / col("w"), lit(maxH) / col("h"), lit(1.0)).as("scale"))
      .select(col("doc_id"), col("format"), col("w"), col("h"),
        floor(col("w") * col("scale")).cast("long").as("out_w"),
        floor(col("h") * col("scale")).cast("long").as("out_h"))
      .orderBy(col("doc_id"))
  }

  def resizeFitSql(maxW: Int = 256, maxH: Int = 256): String = s"""
    WITH feats AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
             GREATEST(CAST(strlen(text) % 640 AS BIGINT), 1) AS w,
             GREATEST(CAST((strlen(text) * 7) % 480 AS BIGINT), 1) AS h
      FROM documents),
    scaled AS (
      SELECT doc_id, format, w, h,
             LEAST(CAST($maxW AS DOUBLE) / w, CAST($maxH AS DOUBLE) / h, 1.0e0) AS scale
      FROM feats)
    SELECT doc_id, format, w, h,
           CAST(FLOOR(w * scale) AS BIGINT) AS out_w,
           CAST(FLOOR(h * scale) AS BIGINT) AS out_h
    FROM scaled ORDER BY doc_id"""

  /** Frame sampling for "video" payloads: explode the payload into
    * fixed-size frame slices (every k-th frame kept) — the shape of a
    * video frame-sampling stage, as pure relational explode. */
  def sampleFrames(spark: SparkSession, dir: String, frameBytes: Int = 100, everyK: Int = 2): DataFrame =
    mediaTable(spark, dir)
      .filter(col("format") === "mp4")
      .select(col("doc_id"), col("media").cast("string").as("payload"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), greatest(length(col("payload")) - 1, lit(0)), lit(frameBytes)),
        s => substring(col("payload"), (s + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame").cast("binary")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  def sampleFramesSql(frameBytes: Int = 100, everyK: Int = 2): String = s"""
    WITH media AS (
      SELECT doc_id, text AS payload FROM documents WHERE doc_id % 4 = 3),
    frames AS (
      SELECT doc_id, CAST(s.i // $frameBytes AS BIGINT) AS frame_idx,
             substr(payload, s.i + 1, $frameBytes) AS frame
      FROM media, LATERAL (SELECT unnest(generate_series(0, GREATEST(length(payload) - 1, 0), $frameBytes)) AS i) s)
    SELECT doc_id, frame_idx, CAST(length(frame) AS BIGINT) AS frame_len,
           md5(frame) AS frame_md5
    FROM frames WHERE frame_idx % $everyK = 0
    ORDER BY doc_id, frame_idx"""
}
