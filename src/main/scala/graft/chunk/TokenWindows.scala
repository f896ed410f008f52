package graft.chunk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** C4: sentence-token window splitter (reference:
  * chunking_manager.py:73-76 — `SentenceTransformersTokenTextSplitter(
  * chunk_overlap, tokens_per_chunk)`): re-chunk a document's token
  * stream into windows of `tokensPerChunk` tokens advancing by
  * `tokensPerChunk - overlap`, so consecutive chunks share `overlap`
  * tokens — the token-budgeted chunking an embedding model needs.
  *
  * The reference counts tokens with the model's own subword tokenizer;
  * the windowing semantics are tokenizer-agnostic, so the declarative
  * query windows the whitespace token stream (oracle-exact) and the
  * same windowing composes with [[graft.text.BpeTokenizer.encodeWord]]
  * for subword budgets (TokenWindowSpec exercises that composition).
  *
  * Scale shape: pure map-side — tokens, window starts and slices are
  * per-row higher-order expressions; no shuffle except the final
  * presentation sort.
  */
object TokenWindows {

  /** (doc_id, chunk_idx, w) rows with the window's token ARRAY — the
    * composable form ([[graft.Pipeline]] plugs this in as the
    * `sentence` splitter, chunk text = tokens joined by ' '). */
  def tokenWindowTable(spark: SparkSession, dir: String,
      tokensPerChunk: Int = 50, overlap: Int = 10): DataFrame = {
    require(overlap >= 0 && overlap < tokensPerChunk)
    val stride = tokensPerChunk - overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(tokensPerChunk)).as("w"))
  }

  /** (doc_id, chunk_idx, n_tokens, chunk_md5) per token window — the
    * driver-gated query form. */
  def tokenWindows(spark: SparkSession, dir: String,
      tokensPerChunk: Int = 50, overlap: Int = 10): DataFrame =
    tokenWindowTable(spark, dir, tokensPerChunk, overlap)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("w")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("w")).cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  def tokenWindowsSql(tokensPerChunk: Int = 50, overlap: Int = 10): String = {
    val stride = tokensPerChunk - overlap
    s"""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents),
    wins AS (
      SELECT doc_id, CAST(u.k - 1 AS BIGINT) AS chunk_idx, u.start
      FROM base, LATERAL (
        SELECT unnest(generate_series(0, n - 1, $stride)) AS start,
               generate_subscripts(generate_series(0, n - 1, $stride), 1) AS k) u)
    SELECT w.doc_id, w.chunk_idx,
           CAST(len(list_slice(b.toks, w.start + 1, w.start + $tokensPerChunk)) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(b.toks, w.start + 1, w.start + $tokensPerChunk), ' ')) AS chunk_md5
    FROM wins w JOIN base b USING (doc_id)
    ORDER BY doc_id, chunk_idx"""
  }
}
