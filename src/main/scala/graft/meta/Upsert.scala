package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Metadata upsert / incremental-processing patterns (SURVEY.md §2.3
  * J1/J2, §2.2 P7): the reference's read-filter-append-rewrite loops
  * (etl_processor.py:143-169; index_manager.py:347-368) re-expressed as
  * anti-join + union — the MERGE shape that stays partition-pruned at
  * scale instead of rewriting a whole JSON file per document.
  */
object Upsert {

  /** J1/J2: last-writer-wins upsert keyed on `key`: anti-join existing
    * rows against updates, then union the updates. */
  def upsert(existing: DataFrame, updates: DataFrame, key: String): DataFrame =
    upsert(existing, updates, Seq(key))

  /** Composite-key form: a row is replaced only when ALL key columns
    * match an update row. */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(updates, keys, "left_anti").unionByName(updates)

  /** P7: incremental skip — rows of `discovered` not yet in `done`. */
  def incrementalSkip(discovered: DataFrame, done: DataFrame, key: String): DataFrame =
    discovered.join(done, Seq(key), "left_anti")

  /** Upsert demo over the testdata, shaped like the reference's
    * documents_metadata upsert: existing = even doc_ids, updates = doc_ids
    * divisible by 3 with bumped n_chunks; result must contain exactly one
    * row per key with updates winning. */
  def upsertDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val existing = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("version", lit(1L))
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("version", lit(2L))
    upsert(existing, updates, "doc_id")
      .orderBy(col("doc_id"))
  }

  def upsertDemoSql: String = """
    WITH existing AS (
      SELECT doc_id, source, n_chars, CAST(1 AS BIGINT) AS version
      FROM documents WHERE doc_id % 2 = 0),
    updates AS (
      SELECT doc_id, source, n_chars, CAST(2 AS BIGINT) AS version
      FROM documents WHERE doc_id % 3 = 0)
    SELECT * FROM (
      SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = e.doc_id)
      UNION ALL SELECT * FROM updates) t
    ORDER BY doc_id"""

  /** P7 demo: discovered docs minus already-processed (doc_id % 4 == 0),
    * counted per source — the skip-if-converted gate. */
  def incrementalSkipDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val done = docs.filter(col("doc_id") % 4 === 0).select(col("doc_id"))
    incrementalSkip(docs, done, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pending"), min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("source"))
  }

  def incrementalSkipDemoSql: String = """
    SELECT source, COUNT(*) AS n_pending, MIN(doc_id) AS min_doc_id
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM documents p WHERE p.doc_id % 4 = 0 AND p.doc_id = d.doc_id)
    GROUP BY source ORDER BY source"""

  /** J3: the figure↔caption as-of assignment as a rank-equi-join.
    * Demonstrated on events: per (user_id, hour) match the i-th 'view'
    * to the i-th 'click' (both in time order) — the reference's ordered
    * 1-to-1 figure/caption-slot matching (markdown_conversion_manager
    * .py:173-200) in relational form: row_number both sides, equi-join
    * on (group, rank). Scale: one shuffle per side on the group key. */
  def asofRankJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .withColumn("hour_us", unix_micros(col("ts")) - unix_micros(col("ts")) % 3600000000L)
    def ranked(kind: String) = {
      val w = Window.partitionBy(col("user_id"), col("hour_us")).orderBy(col("ts"), col("event_id"))
      ev.filter(col("event_type") === kind)
        .select(col("user_id"), col("hour_us"), col("event_id"), row_number().over(w).as("rk"))
    }
    ranked("view").as("v")
      .join(ranked("click").withColumnRenamed("event_id", "click_event_id").as("c"),
        Seq("user_id", "hour_us", "rk"))
      .select(col("user_id"), col("hour_us"), col("rk").cast("long").as("rk"),
        col("event_id").as("view_event_id"), col("click_event_id"))
      .orderBy(col("user_id"), col("hour_us"), col("rk"))
  }

  def asofRankJoinSql: String = """
    WITH ranked AS (
      SELECT user_id, (epoch_us(ts) - epoch_us(ts) % 3600000000) AS hour_us,
             event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, (epoch_us(ts) - epoch_us(ts) % 3600000000), event_type
                                ORDER BY ts, event_id) AS rk
      FROM events WHERE event_type IN ('view', 'click'))
    SELECT v.user_id, v.hour_us, CAST(v.rk AS BIGINT) AS rk,
           v.event_id AS view_event_id, c.event_id AS click_event_id
    FROM ranked v JOIN ranked c
      ON v.user_id = c.user_id AND v.hour_us = c.hour_us AND v.rk = c.rk
     AND v.event_type = 'view' AND c.event_type = 'click'
    ORDER BY v.user_id, v.hour_us, v.rk"""
}
