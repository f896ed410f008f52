package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage (SURVEY.md §2.1): text/json/csv/binaryFile
  * roundtrips with schema enforcement — the reference's file-format
  * boundary re-expressed as Spark sources. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("S6/S5: text sink + wholetext source roundtrip") {
    val dir = s"${tmp()}/md"
    val doc = "# Title\nbody line\n"
    Seq(doc).toDF("value").coalesce(1).write.text(dir)
    val back = spark.read.option("wholetext", "true").text(dir).as[String].head()
    assert(back.trim == doc.trim)
  }

  test("S8: json catalog sink + schema-enforced source roundtrip") {
    val dir = s"${tmp()}/catalog"
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("page", IntegerType),
      StructField("bbox", ArrayType(DoubleType)), StructField("caption", StringType)))
    val cat = Seq(
      ("FIG_001_01", 1, Seq(1.0, 2.0, 3.0, 4.0), "a figure"),
      ("FIG_002_01", 2, Seq(0.0, 0.0, 10.0, 10.0), null),
    ).toDF("id", "page", "bbox", "caption")
    cat.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).option("mode", "FAILFAST").json(dir)
    assert(back.count() == 2)
    assert(back.schema == schema)
    assert(back.filter(col("caption").isNull).count() == 1)
  }

  test("S9-style: csv sink/source with header") {
    val dir = s"${tmp()}/csv"
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("k", "name", "v")
    df.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("k LONG, name STRING, v DOUBLE").csv(dir)
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("S1/S3: binaryFile source with pathGlobFilter reads payload + length") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(s"$dir/a.pdf"), "fake-pdf-bytes".getBytes)
    Files.write(java.nio.file.Paths.get(s"$dir/b.txt"), "not-matched".getBytes)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf").load(dir)
    val rows = bin.select(col("path"), col("length"), col("content")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("length") == "fake-pdf-bytes".length.toLong)
    assert(new String(rows.head.getAs[Array[Byte]]("content")) == "fake-pdf-bytes")
  }

  test("S2: extension tag-not-drop filter marks unsupported rows") {
    val supported = Seq("pdf", "xps", "epub", "mobi", "fb2", "cbz", "svg", "txt")
    val files = Seq("a.pdf", "b.PDF", "c.docx", "noext").toDF("filename")
    val tagged = files.select(col("filename"),
      element_at(split(lower(col("filename")), "\\."), -1).as("ext"))
      .withColumn("ok", col("ext").isin(supported: _*) && col("filename").contains("."))
    val m = tagged.as[(String, String, Boolean)].collect().map(t => t._1 -> t._3).toMap
    assert(m("a.pdf") && m("b.PDF") && !m("c.docx") && !m("noext"))
  }

  test("S4 boundary runs real conversion code: sniff + charset decode + markup strip + chunk") {
    val dir = Files.createTempDirectory("graft-conv")
    val utf8Text = "# Doc one\n\nplain utf-8 body with enough words to chunk " + ("lorem ipsum " * 40)
    Files.write(dir.resolve("plain.txt"), utf8Text.getBytes("UTF-8"))
    // UTF-16LE with BOM — a byte-level decode the stub's fixed UTF-8 would mangle
    val utf16Text = "utf sixteen body text"
    val utf16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++ utf16Text.getBytes("UTF-16LE")
    Files.write(dir.resolve("wide.txt"), utf16)
    val svg = """<?xml version="1.0"?><svg><title>A &amp; B</title><desc>vector caption</desc></svg>"""
    Files.write(dir.resolve("figure.svg"), svg.getBytes("UTF-8"))
    // UTF-16BE with BOM and UTF-8 with BOM — the other two decode branches
    val beText = "big endian text"
    Files.write(dir.resolve("be.txt"),
      Array[Byte](0xfe.toByte, 0xff.toByte) ++ beText.getBytes("UTF-16BE"))
    val bomText = "bom stripped"
    Files.write(dir.resolve("bom.txt"),
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ bomText.getBytes("UTF-8"))
    // real PDF magic — no codec in sandbox, must be routed + tagged, not decoded
    Files.write(dir.resolve("paper.pdf"), "%PDF-1.7 binarybinary".getBytes("UTF-8"))
    Files.write(dir.resolve("skipme.docx"), Array[Byte](1, 2, 3)) // unsupported ext

    val converted = sources.DocumentSource.convert(spark,
      sources.DocumentSource.scan(spark, dir.toString))
    val byName = converted.collect().map(r => r.getString(0) -> r).toMap
    assert(byName.keySet ==
      Set("plain.txt", "wide.txt", "be.txt", "bom.txt", "figure.svg", "paper.pdf"))
    assert(byName("be.txt").getString(2) == "utf16be")
    assert(byName("be.txt").getString(4) == beText, "BOM'd UTF-16BE must decode")
    assert(byName("bom.txt").getString(2) == "text")
    assert(byName("bom.txt").getString(4) == bomText, "UTF-8 BOM must be stripped")
    assert(byName("plain.txt").getString(2) == "text" && byName("plain.txt").getBoolean(3))
    assert(byName("plain.txt").getString(4) == utf8Text)
    assert(byName("wide.txt").getString(2) == "utf16le")
    assert(byName("wide.txt").getString(4) == utf16Text, "BOM'd UTF-16 must decode")
    assert(byName("figure.svg").getString(2) == "xml")
    assert(byName("figure.svg").getString(4) == "A & B vector caption",
      "markup stripped, entities decoded")
    assert(byName("paper.pdf").getString(2) == "pdf" && !byName("paper.pdf").getBoolean(3))
    assert(byName("paper.pdf").getString(4).isEmpty)

    // end to end: converted text feeds the chunker unchanged
    val docs = converted.filter(col("converted"))
      .select(xxhash64(col("filename")).as("doc_id"), col("text"))
    val chunks = graft.chunk.Chunking.chunkTable(docs, size = 100, overlap = 20)
    assert(chunks.count() > 3, "the long utf-8 doc must split into several chunks")
    assert(chunks.select("doc_id").distinct().count() == 5)
  }

  test("markdown content breaks respect fence parity (F13 fixture)") {
    val doc = "intro\n\n```\n# not-a-header\n```\n# real-header\ntail"
    val lines = text.MarkdownOps.lineFrame(Seq((1L, doc)).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val breaks = text.MarkdownOps.contentBreaks(lines, Seq("doc_id"))
      .select("lineno").as[Long].collect().toSet
    // line 1 (blank) and line 5 (# real-header) are breaks;
    // line 3 (# not-a-header, inside fence) is NOT
    assert(breaks == Set(1L, 5L))
  }

  test("caption spots found at keyword lines with preceding blank (F12 fixture)") {
    val doc = "text above\n\nFigure 3: flow diagram\nmore\nTable 1: data"
    val lines = text.MarkdownOps.lineFrame(Seq((1L, doc)).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val spots = text.MarkdownOps.captionSpots(lines, Seq("doc_id"))
      .select("lineno", "prev_blank").as[(Long, Boolean)].collect().toMap
    assert(spots == Map(2L -> true, 4L -> false))
  }
}
