package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus ingestion (SURVEY.md §2.1 S1–S4): the reference's
  * directory scan + extension filter + per-file conversion loop
  * (etl_processor.py:194-204) as one declarative source pipeline over
  * `binaryFile`.
  *
  * The actual PDF→Markdown conversion (S4, pymupdf4llm) is an external
  * codec that can't ship here; [[convertStub]] stands in with a
  * deterministic bytes→text decode at exactly the boundary a real
  * converter would occupy (a mapPartitions batch stage, like
  * Multimodal.decodeFeatures).
  */
object DocumentSource {

  val SupportedExtensions: Seq[String] =
    Seq("pdf", "xps", "epub", "mobi", "fb2", "cbz", "svg", "txt") // document_processor.py:11

  /** Scan a directory of files into the tagged-document frame:
    * (path, filename, ext, ok, length, content). Rejected rows are
    * TAGGED, not dropped (S2 semantics: the reference logs-and-skips,
    * etl_processor.py:102-106). */
  def scan(spark: SparkSession, dir: String, allowed: Seq[String] = SupportedExtensions): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        col("path"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        col("length"), col("content"))
      .withColumn("ext",
        when(col("filename").contains("."),
          element_at(split(lower(col("filename")), "\\."), -1)).otherwise(lit(null)))
      .withColumn("ok", coalesce(col("ext").isin(allowed: _*), lit(false)))

  /** STUB converter: bytes → text (a real build would call the PDF
    * codec here, batched per partition). Deterministic: UTF-8 decode. */
  def convertStub(scanned: DataFrame): DataFrame =
    scanned.filter(col("ok"))
      .select(
        col("filename"),
        col("ext").as("file_extension"),
        decode(col("content"), "UTF-8").as("text"),
        col("length").as("n_bytes"))
}
