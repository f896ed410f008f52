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

  test("mojibake counts: replacement chars, C1 controls, cp1252 digraphs") {
    val tmp = java.nio.file.Files.createTempDirectory("mj").toString
    // doc 0 (no injected probes: 0 % k == 0): one U+FFFD, one C1
    // control, three digraphs (Ã©, Â°, â€™)
    val t0 = "ok Ã© bad � x  plain Â° q â€™"
    // doc 12 (also probe-free): clean text → keep
    val t12 = "clean text with no artifacts " * 4
    Seq((0L, t0), (5L, ""), (12L, t12)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("text_mojibake")(spark, tmp)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(rows(0) == ((0L, 1L, 1L, 3L, 5.0 / t0.length, false)))
    // doc 5: empty text, injected probes only — 5%3=2 U+FFFD, 5%2=1 Ã©,
    // 5%4=1 C1 → 5 chars, 4 bad
    assert(rows(1) == ((5L, 2L, 1L, 1L, 4.0 / 5, false)))
    assert(rows(2) == ((12L, 0L, 0L, 0L, 0.0, true)))
  }

  test("bigram LM: hand-computed add-one-smoothed cross-entropy") {
    val tmp = java.nio.file.Files.createTempDirectory("lm").toString
    Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // uni: a=3, b=2; V=2. bigrams: (a,b)×2, (b,a)×1.
    // q(a,b) = floor(1e4·ln((3+2)/(2+1))) = floor(1e4·ln(5/3)) = 5108
    // q(b,a) = floor(1e4·ln((2+2)/(1+1))) = floor(1e4·ln 2)     = 6931
    val rows = SparkEntry.queries("text_lm_perplexity")(spark, tmp)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, 2L, 12039L, 12039.0 / 2 / 10000),  // (a,b) + (b,a)
      (2L, 1L, 5108L, 5108.0 / 1 / 10000)))   // (a,b)
  }

  test("piiScrub order: email digits never half-match the number pattern") {
    val out = Seq("user123456789@example.com done").toDF("t")
      .select(piiScrub(col("t"))).as[String].collect().head
    assert(out == "<EMAIL> done")
  }
}
