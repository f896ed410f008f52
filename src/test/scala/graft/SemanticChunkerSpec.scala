package graft

import org.apache.spark.sql.functions._

import graft.chunk.{SemanticChunker, TokenWindows}
import graft.text.{BpeTokenizer, TextFunctions}

/** C3 semantic splitter + C4 token-window splitter (§2.9). */
class SemanticChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("semantic chunks cover every document exactly once") {
    val chunks = SemanticChunker.semanticChunks(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .filter(length(col("t")) > 0)
    // every qualifying doc chunked, none invented
    assert(chunks.select("doc_id").distinct().count() == docs.count())
    // chunk lengths and sentence counts reconstruct the document:
    // joined chunks = sentences joined by ' ', so per doc
    // sum(chunk_len) + (n_chunks - 1) == norm length
    val recon = chunks.groupBy(col("doc_id"))
      .agg((sum(col("chunk_len")) + count(lit(1)) - 1).as("joined"),
        sum(col("n_sentences")).as("n_sents"))
      .join(docs, Seq("doc_id"))
      .filter(col("joined") =!= length(col("t")))
    assert(recon.count() == 0, "chunk lengths must reconstruct the document")
  }

  test("min_chunk_size: every non-final chunk has at least chunk_size/3 chars") {
    val chunks = SemanticChunker.semanticChunks(spark, sf)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val nonFinal = chunks
      .withColumn("last_idx", max(col("chunk_idx")).over(w))
      .filter(col("chunk_idx") < col("last_idx"))
    assert(nonFinal.filter(col("chunk_len") < 66).count() == 0)
  }

  test("breakpoints actually split multi-sentence documents") {
    val chunks = SemanticChunker.semanticChunks(spark, sf)
    // the corpus has multi-sentence docs; some must break into >1 chunk
    assert(chunks.groupBy("doc_id").count().filter(col("count") > 1).count() > 0)
  }

  test("property: random corpora reconstruct and respect min-size") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "w", "longword")
    (1 to 3).foreach { trial =>
      val docs = (1L to 40L).map { id =>
        val n = 5 + rnd.nextInt(120)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"sem-prop$trial").toString
      docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
      val chunks = SemanticChunker.semanticChunks(spark, tmp).cache()
      val norm = Tables.documents(spark, tmp)
        .select(col("doc_id"), length(TextFunctions.normalize(col("text"))).as("nl"))
      // reconstruction: per doc, sum(chunk_len) + (n_chunks - 1) == norm length
      val bad = chunks.groupBy(col("doc_id"))
        .agg((sum(col("chunk_len")) + count(lit(1)) - 1).as("joined"))
        .join(norm, Seq("doc_id"))
        .filter(col("joined") =!= col("nl"))
      assert(bad.count() == 0, s"trial $trial reconstruction")
      // min-size: every non-final chunk >= 66 chars
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val short = chunks.withColumn("last", max(col("chunk_idx")).over(w))
        .filter(col("chunk_idx") < col("last") && col("chunk_len") < 66)
      assert(short.count() == 0, s"trial $trial min-size")
      chunks.unpersist()
    }
  }

  test("token windows: counts, overlap arithmetic, and full coverage") {
    val tpc = 50
    val ov = 10
    val wins = TokenWindows.tokenWindows(spark, sf, tpc, ov).cache()
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val agg = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_wins"), sum(col("n_tokens")).as("sum_toks"),
        max(col("n_tokens")).as("max_toks"))
      .join(nToks, Seq("doc_id"))
    // every window <= tpc tokens; window count = ceil(n / stride);
    // total tokens = n + overlap tokens repeated per extra window,
    // except trailing windows shorter than the overlap
    assert(agg.filter(col("max_toks") > tpc).count() == 0)
    assert(agg.filter(col("n_wins") =!= ceil(col("n") / (tpc - ov)).cast("long")).count() == 0)
    assert(agg.filter(col("sum_toks") < col("n")).count() == 0)
  }

  test("token windowing composes with BPE subword budgets") {
    val docs = Tables.documents(spark, sf).limit(50)
    val merges = BpeTokenizer.train(spark, docs, 30)
    val bc = spark.sparkContext.broadcast(merges)
    // window the SUBWORD stream: tokens_per_chunk counted in subwords
    val tpc = 64
    val subChunks = docs
      .select(col("doc_id"), TextFunctions.tokens(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val subs = toks.flatMap(w => BpeTokenizer.encodeWord(w, bc.value))
        (id, subs.grouped(tpc).map(_.size).toSeq)
      }
      .toDF("doc_id", "win_sizes")
    val bad = subChunks
      .select(col("doc_id"), explode(col("win_sizes")).as("sz"))
      .filter(col("sz") > tpc || col("sz") < 1)
    assert(bad.count() == 0)
  }
}
