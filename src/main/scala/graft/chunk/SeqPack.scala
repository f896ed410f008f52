package graft.chunk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Training-sequence packing: pack whole documents, in deterministic
  * doc_id order within a source shard, into fixed token-budget
  * sequences (context windows) by the greedy rule every LLM data
  * pipeline uses — close the current sequence when the next document
  * would overflow `capacity`; a single oversized document gets a
  * sequence of its own. Output is one row per document:
  * (source, doc_id, n_tokens, seq_idx, slot) where `seq_idx` numbers
  * sequences within the source and `slot` is the document's position
  * inside its sequence.
  *
  * Scale shape: the walk is sequential ONLY within a packing shard
  * (here `source`; at 100 TB the key is (source, shard) with shards
  * minted by doc_id range so every group is bounded — same contract as
  * the reference's per-document loops). One shuffle on the shard key,
  * then a purely CPU-local greedy fold per group; no driver-side data.
  * The same walk is the DuckDB oracle's recursive CTE over the per-
  * source row index, so packing decisions are hash-gated end to end.
  */
object SeqPack {

  /** Greedy fold over one shard's (doc_id, n_tokens) list, ordered by
    * doc_id. Emits (doc_id, n_tokens, seq_idx, slot). */
  def packShard(docs: Seq[(Long, Long)], capacity: Long): Seq[(Long, Long, Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long, Long, Long)]
    var seq = 0L; var slot = 0L; var cum = 0L; var first = true
    docs.sortBy(_._1).foreach { case (id, n) =>
      if (first) { seq = 0; slot = 0; cum = n; first = false }
      else if (cum + n > capacity) { seq += 1; slot = 0; cum = n }
      else { slot += 1; cum += n }
      out += ((id, n, seq, slot))
    }
    out.result()
  }

  /** The driver-gated query: documents packed per `source` with a
    * `capacity`-token budget (whitespace tokenization, the same
    * [[TextFunctions.tokenCount]] the text_tokens query gates). */
  def packDocs(spark: SparkSession, dir: String, capacity: Long = 256L): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (src, it) =>
        // group = one packing shard, bounded by construction (see above)
        packShard(it.map(r => (r._2, r._3)).toSeq, capacity)
          .map { case (id, n, seq, slot) => (src, id, n, seq, slot) }
          .iterator
      }
      .toDF("source", "doc_id", "n_tokens", "seq_idx", "slot")
      .orderBy(col("source"), col("doc_id"))
  }

  /** The identical walk as a DuckDB recursive CTE: one working row per
    * source advances down the per-source row index carrying
    * (seq_idx, slot, cum). */
  def packDocsSql(capacity: Long = 256L): String = s"""
    WITH RECURSIVE toks AS (
      SELECT source, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    walk(source, rn, doc_id, n_tokens, seq_idx, slot, cum) AS (
      SELECT source, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.source, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN CAST(0 AS BIGINT) ELSE w.slot + 1 END,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN t.n_tokens ELSE w.cum + t.n_tokens END
      FROM walk w JOIN toks t ON t.source = w.source AND t.rn = w.rn + 1)
    SELECT source, doc_id, n_tokens, seq_idx, slot
    FROM walk ORDER BY source, doc_id"""
}
