package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.{CodingErrorAction, StandardCharsets}

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
    * codec here, batched per partition). Deterministic: UTF-8 decode.
    * [[convert]] below is the REAL boundary; this minimal form is kept
    * for tests that only need a payload decode. */
  def convertStub(scanned: DataFrame): DataFrame =
    scanned.filter(col("ok"))
      .select(
        col("filename"),
        col("ext").as("file_extension"),
        decode(col("content"), "UTF-8").as("text"),
        col("length").as("n_bytes"))

  /** Byte-level format sniff on magic numbers — converter routing by
    * CONTENT, not extension trust (catches mislabeled files; the
    * reference routes by filetype at document_processor.py:11). */
  private[sources] def sniff(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "pdf"
    else if (at(0) == 0x50 && at(1) == 0x4b && at(2) == 0x03 && at(3) == 0x04) "zip"
    else if (at(0) == 0x1f && at(1) == 0x8b) "gzip"
    else if (at(0) == 0xff && at(1) == 0xfe) "utf16le"
    else if (at(0) == 0xfe && at(1) == 0xff) "utf16be"
    else {
      val head = new String(b.take(256), StandardCharsets.US_ASCII).trim
      if (head.startsWith("<?xml") || head.startsWith("<svg") ||
        head.startsWith("<FictionBook") || head.startsWith("<html")) "xml"
      else "text"
    }
  }

  /** BOM-aware charset decode: UTF-16 LE/BE by BOM, else UTF-8 with
    * replacement (never throws on stray bytes — log-and-continue). */
  private[sources] def decodeText(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xfe)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16LE)
    else if (at(0) == 0xfe && at(1) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else {
      val skip = if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) 3 else 0
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
      dec.decode(java.nio.ByteBuffer.wrap(b, skip, b.length - skip)).toString
    }
  }

  /** Markup → text for the XML-based formats (svg, fb2, html-ish):
    * tags dropped, the five core entities decoded, horizontal
    * whitespace collapsed per line, blank lines squeezed. */
  private[sources] def stripMarkup(s: String): String =
    s.replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll("<[^>]*>", " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")
      .linesIterator
      .map(_.replaceAll("[ \\t]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")

  /** The REAL S4 conversion boundary, executing non-stub JVM code end
    * to end: a per-partition batch stage over raw bytes (exactly where
    * the reference calls its PDF codec, markdown_conversion_manager.py:
    * 95-101) that sniffs each payload's actual format, charset-decodes
    * text (UTF-8 / BOM'd UTF-16), strips markup from XML-based formats,
    * and TAGS binary formats whose codec isn't in this sandbox
    * (pdf/zip/gzip) as unconverted instead of dropping them — the
    * reference's log-and-skip. Output: (filename, file_extension,
    * format, converted, text, n_bytes, n_chars). */
  def convert(spark: SparkSession, scanned: DataFrame): DataFrame = {
    import spark.implicits._
    scanned.filter(col("ok"))
      .select(col("filename"), col("ext"), col("length"), col("content"))
      .as[(String, String, Long, Array[Byte])]
      .mapPartitions { it =>
        // one batch per partition: a real codec would amortize its
        // per-batch init (model load, native handles) across these rows
        it.map { case (name, ext, len, bytes) =>
          val fmt = sniff(bytes)
          val text = fmt match {
            case "pdf" | "zip" | "gzip" => "" // no in-sandbox codec
            case "xml" => stripMarkup(decodeText(bytes))
            case _ => decodeText(bytes)
          }
          val converted = fmt != "pdf" && fmt != "zip" && fmt != "gzip"
          (name, ext, fmt, converted, text, len, text.length.toLong)
        }
      }
      .toDF("filename", "file_extension", "format", "converted", "text",
        "n_bytes", "n_chars")
  }
}
