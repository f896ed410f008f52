package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions._
import graft.functions.Nfkc.nfkc

/** Normalization fixtures mirror the reference regex semantics
  * (FIXTURES.md §"Text fixtures"; markdown_manager.py:52-69). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(normalize(col("t"))).as[String].head()

  test("F1 drops bracketed-ellipsis lines") {
    assert(norm("keep\nx [....] y\nalso") == "keep\nalso")
  }
  test("F3 CRLF to LF") { assert(norm("a\r\nb") == "a\nb") }
  test("F4 collapses spaces and tabs") { assert(norm("a  \t b") == "a b") }
  test("F5 caps blank lines at two") { assert(norm("x\n\n\n\ny") == "x\n\ny") }
  test("F6 strips soft hyphen") { assert(norm("co­op") == "coop") }
  test("F7 dehyphenates line breaks") { assert(norm("car-\ndiology") == "cardiology") }
  test("F8 trims") { assert(norm("  x  ") == "x") }

  test("F9 alt-text sanitize: collapse, strip link chars, default") {
    val out = Seq("  a  [b](c)  ", "   ", "[]()").toDF("t")
      .select(sanitizeAltText(col("t"))).as[String].collect().toSeq
    assert(out == Seq("a bc", "image", "image"))
  }

  test("F2 NFKC via custom expression: ligature and fullwidth forms") {
    val out = Seq("ﬁle ＡＢ ①").toDF("t").select(nfkc(col("t"))).as[String].head()
    assert(out == "file AB 1")
  }

  test("nfkc is null-safe and codegen-compatible in a chain") {
    val out = Seq(("x", "ﬁn"), ("y", null)).toDF("k", "t")
      .select(col("k"), nfkc(normalize(col("t"))).as("n"))
      .as[(String, Option[String])].collect().toMap
    assert(out("x").contains("fin") && out("y").isEmpty)
  }

  test("token counts: empty, blank, multi-space") {
    val out = Seq("", "   ", "a b  c").toDF("t")
      .select(tokenCount(col("t"))).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 3L))
  }

  test("language id: argmax with tie-break, und when no stopwords") {
    val out = Seq("the cat and the dog", "el perro y la casa de que", "zzz qqq")
      .toDF("t").select(langId(col("t"))).as[String].collect().toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("fingerprint is case/punct-insensitive") {
    val fps = Seq("Hello, World!", "hello world", "HELLO  world").toDF("t")
      .select(fingerprint(col("t"))).as[String].collect().toSeq
    assert(fps.distinct.size == 1)
  }

  test("piiScrub redacts emails, IPv4s, and long digit runs") {
    val out = Seq(
      "mail a.b+c@sub.example.org now",
      "server at 192.168.001.1 up",
      "acct 123456789 and 9876543210123",
      "short 12345678 stays; ref55 stays",
      "combo x@y.io on 10.0.0.7 id 111222333",
    ).toDF("t").select(piiScrub(col("t"))).as[String].collect().toSeq
    assert(out == Seq(
      "mail <EMAIL> now",
      "server at <IP> up",
      "acct <NUM> and <NUM>",
      "short 12345678 stays; ref55 stays",
      "combo <EMAIL> on <IP> id <NUM>"))
  }

  test("term commonness: hand-computed corpus frequencies, hapax fraction") {
    val tmp = java.nio.file.Files.createTempDirectory("tc").toString
    Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // counts: a=3, b=1, c=1; corpus total 5
    val rows = SparkEntry.queries("text_term_commonness")(spark, tmp)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, 3L, 7L, 7.0 / 3 / 5, 1.0 / 3),   // a,a,b → 3+3+1
      (2L, 2L, 4L, 4.0 / 2 / 5, 1.0 / 2)))  // a,c → 3+1
  }

  test("piiScrub order: email digits never half-match the number pattern") {
    val out = Seq("user123456789@example.com done").toDF("t")
      .select(piiScrub(col("t"))).as[String].collect().head
    assert(out == "<EMAIL> done")
  }
}
