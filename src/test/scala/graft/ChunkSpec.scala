package graft

import org.apache.spark.sql.functions._
import graft.chunk.{Chunking, RecursiveSplitter}
import graft.functions.ChunkSplit.chunk_split

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-stride chunks cover the text with the configured overlap") {
    val text = "abcdefghijklmnopqrstuvwxyz" * 20 // 520 chars
    val chunks = Seq(text).toDF("t")
      .select(Chunking.fixedStrideChunks(col("t"), 200, 50))
      .as[Seq[String]].head()
    assert(chunks.head.length == 200)
    assert(chunks.forall(_.length <= 200))
    // stride 150: chunk i starts at i*150
    chunks.zipWithIndex.foreach { case (c, i) =>
      assert(text.slice(i * 150, i * 150 + 200) == c)
    }
  }

  test("header split: levels, titles, preamble") {
    val doc = "intro text\n# A\nbody a\n## B\nbody b\n#### D\ndeep"
    val rows = Chunking.annotatedHeaderChunks(
      Seq((1L, doc)).toDF("doc_id", "text"))
      .select("chunk_idx", "header_level", "header_title")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq((0L, 0L, ""), (1L, 1L, "A"), (2L, 2L, "B"), (3L, 4L, "D")))
  }

  test("header split ignores headers beyond maxLevel") {
    val doc = "# A\n##### five\nstill in A"
    val n = Chunking.annotatedHeaderChunks(Seq((1L, doc)).toDF("doc_id", "text")).count()
    assert(n == 1)
  }

  test("ChunkSplit generator matches the pure splitter") {
    val text = ("alpha beta gamma " * 30).trim
    val viaGen = Seq((7L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), chunk_split(col("text"), 100, 20))
      .as[(Long, Long, String)].collect().toSeq
    val direct = RecursiveSplitter.split(text, 100, 20)
    assert(viaGen.map(_._3) == direct)
    assert(viaGen.map(_._2) == direct.indices.map(_.toLong))
  }

  test("CDC chunks reconstruct the text and resist prefix shifts") {
    // aperiodic deterministic text so window hashes vary enough for
    // boundaries to occur (a short periodic string can have no
    // boundary-hash at all)
    val text = (1 to 300).map(i => s"w${i * 7919 % 997}").mkString(" ")
    def chunksOf(t: String): Seq[String] =
      Seq(t).toDF("text").select(Chunking.cdcChunks(col("text")))
        .as[Seq[String]].head()
    val base = chunksOf(text)
    assert(base.mkString == text)
    // insert a prefix: fixed-stride would shift EVERY chunk; CDC must
    // leave the tail chunks (past the first re-synced boundary) intact
    val shifted = chunksOf("INSERTED PREFIX " + text)
    assert(shifted.mkString == "INSERTED PREFIX " + text)
    val common = base.toSet.intersect(shifted.toSet)
    assert(common.nonEmpty, "no shared chunks after prefix insertion — not content-defined")
  }

  test("rolling CDC recurrence equals the expression form on varied texts") {
    def exprChunks(t: String): Seq[String] =
      Seq(t).toDF("text").select(Chunking.cdcChunks(col("text")))
        .as[Seq[String]].head()
    val texts = Seq(
      (1 to 300).map(i => s"w${i * 7919 % 997}").mkString(" "),
      "short",
      "exactly8!",
      "a" * 7,                       // shorter than the window
      "x y z " * 100,
      "café naïve " * 40,  // multi-byte code points
    )
    texts.foreach { t =>
      assert(Chunking.cdcChunksRolling(t) == exprChunks(t).toVector,
        s"rolling != expression for ${t.take(30)}...")
    }
  }

  test("ChunkSplit generator emits nothing for null text") {
    val n = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(chunk_split(col("text"), 100, 20)).count()
    assert(n == 0)
  }
}
