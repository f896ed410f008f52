package graft.chunk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{BpeTokenizer, TextFunctions}

/** Training-sequence packing: pack whole documents, in deterministic
  * doc_id order within a packing shard, into fixed token-budget
  * sequences (context windows) by the greedy rule every LLM data
  * pipeline uses — close the current sequence when the next document
  * would overflow `capacity`; a single oversized document gets a
  * sequence of its own.
  *
  * The packing shard is the composite key (source, doc_id / shardSize):
  * shards are minted by doc_id range, so EVERY group handed to the
  * sequential fold is bounded by `shardSize` documents no matter how
  * skewed the source distribution is — one dominant source at 100 TB
  * becomes many bounded shards, not one unbounded flatMapGroups task.
  * One shuffle on the shard key, then a purely CPU-local greedy fold
  * per group; no driver-side data. `seq_idx` is shard-local (globally
  * unique as (source, shard, seq_idx) — the stable naming an output
  * writer would use for sequence files).
  *
  * The same walk is the DuckDB oracle's recursive CTE over the
  * per-shard row index, so packing decisions are hash-gated end to end.
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

  /** Sharded packing of any per-document token-count frame
    * (source, doc_id, n_tokens) — the composition point that lets the
    * same packer run on whitespace counts, BPE subword counts, or any
    * other length model. Output adds (shard, seq_idx, slot). */
  def packCounts(spark: SparkSession, counts: DataFrame,
      capacity: Long, shardSize: Long): DataFrame = {
    import spark.implicits._
    counts.select(col("source"), col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(r => (r._1, r._2 / shardSize))
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long)]) =>
        // group ≤ shardSize docs by construction of the key
        packShard(it.map(r => (r._2, r._3)).toSeq, capacity)
          .map { case (id, n, seq, slot) => (key._1, key._2, id, n, seq, slot) }
          .iterator
      }
      .toDF("source", "shard", "doc_id", "n_tokens", "seq_idx", "slot")
  }

  /** The driver-gated query: documents packed per (source, shard) with
    * a `capacity`-token budget (whitespace tokenization, the same
    * [[TextFunctions.tokenCount]] the text_tokens query gates). */
  def packDocs(spark: SparkSession, dir: String,
      capacity: Long = 256L, shardSize: Long = 64L): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
    packCounts(spark, counts, capacity, shardSize)
      .orderBy(col("source"), col("doc_id"))
  }

  /** The identical walk as a DuckDB recursive CTE: one working row per
    * (source, shard) advances down the shard-local row index carrying
    * (seq_idx, slot, cum). */
  def packDocsSql(capacity: Long = 256L, shardSize: Long = 64L): String = s"""
    WITH RECURSIVE toks AS (
      SELECT source, doc_id, doc_id // $shardSize AS shard,
             CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source, doc_id // $shardSize ORDER BY doc_id) AS rn
      FROM documents),
    walk(source, shard, rn, doc_id, n_tokens, seq_idx, slot, cum) AS (
      SELECT source, shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.source, t.shard, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN CAST(0 AS BIGINT) ELSE w.slot + 1 END,
             CASE WHEN w.cum + t.n_tokens > $capacity THEN t.n_tokens ELSE w.cum + t.n_tokens END
      FROM walk w JOIN toks t ON t.source = w.source AND t.shard = w.shard AND t.rn = w.rn + 1)
    SELECT source, shard, doc_id, n_tokens, seq_idx, slot
    FROM walk ORDER BY source, doc_id"""

  /** BPE-faithful packing — the reference's contract (chunk/sequence
    * length measured by the TOKENIZER, not whitespace; see
    * /root/reference/src/managers/chunking_manager.py:165-169): the
    * packer runs on [[BpeTokenizer]] subword counts learned from the
    * corpus itself.
    *
    * Learned merges are model data a blind SQL oracle cannot reproduce,
    * so this query is gated by the invariant-oracle pattern: it emits
    * exactly-computable columns (source, shard, doc_id, n_words)
    * plus booleans for every property the packing + tokenization
    * contract guarantees —
    *  - bounds_ok: n_words ≤ n_bpe_tokens ≤ n_word_chars + n_words
    *    (BPE merges only ever join characters, one end-of-word marker
    *    per word);
    *  - fits_ok: my sequence's total BPE tokens ≤ capacity, or the
    *    sequence holds only me (oversized singleton);
    *  - maximal_ok: if I open sequence k>0, the previous sequence
    *    could not have absorbed me (its total + mine > capacity).
    * Hash mismatch ⇔ a property violated. All checks are window/join
    * computations keyed by (source, shard) — distributed, bounded. */
  def packDocsBpe(spark: SparkSession, dir: String, capacity: Long = 256L,
      shardSize: Long = 64L, numMerges: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = BpeTokenizer.train(spark, docs, numMerges)
    // cached: the frame feeds both the packer and the invariant join —
    // without a materialization point the BPE inference pass over the
    // corpus runs twice (per-doc count rows only, corpus-cardinality)
    val counts = BpeTokenizer.subwordCounts(spark, docs, merges)
      .join(docs.select(col("doc_id"), col("source"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
          .cast("long").as("n_word_chars")), Seq("doc_id"))
      .select(col("source"), col("doc_id"), col("n_words"), col("n_word_chars"),
        col("n_subwords").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheScope.register)
    val packed = packCounts(spark, counts.select("source", "doc_id", "n_tokens"),
      capacity, shardSize)
      .join(counts.select(col("doc_id"), col("n_words"), col("n_word_chars")), Seq("doc_id"))
    val seqW = Window.partitionBy(col("source"), col("shard"), col("seq_idx"))
    val seqs = packed.groupBy(col("source"), col("shard"), col("seq_idx"))
      .agg(sum(col("n_tokens")).as("prev_sum"))
      .select(col("source"), col("shard"), (col("seq_idx") + 1).as("seq_idx"), col("prev_sum"))
    packed
      .withColumn("seq_total", sum(col("n_tokens")).over(seqW))
      .withColumn("seq_count", count(lit(1)).over(seqW))
      .join(seqs, Seq("source", "shard", "seq_idx"), "left")
      .select(
        col("source"), col("shard"), col("doc_id"), col("n_words"),
        (col("n_words") <= col("n_tokens") &&
          col("n_tokens") <= col("n_word_chars") + col("n_words")).as("bounds_ok"),
        (col("seq_total") <= capacity || col("seq_count") === 1).as("fits_ok"),
        (col("slot") =!= 0 || col("seq_idx") === 0 ||
          col("prev_sum") + col("n_tokens") > capacity).as("maximal_ok"))
      .orderBy(col("doc_id"))
  }

  /** Blind oracle for [[packDocsBpe]]: the exact columns in SQL, the
    * contract booleans as literal TRUE (mirrors
    * BpeTokenizer.subwordInvariantsSql's empty-doc token semantics). */
  def packDocsBpeSql(shardSize: Long = 64L): String = s"""
    SELECT source, doc_id // $shardSize AS shard, doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 1
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_words,
           TRUE AS bounds_ok, TRUE AS fits_ok, TRUE AS maximal_ok
    FROM documents ORDER BY doc_id"""
}
