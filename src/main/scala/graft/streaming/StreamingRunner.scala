package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** True Structured Streaming execution of the event-window operators
  * (SURVEY.md §2.12). The same aggregation expressions as
  * [[EventWindows]] run under `readStream` with a watermark, proving
  * the batch operators are streaming-safe. Used by StreamingSpec (the
  * driver's oracle gate runs the batch forms; streams have no DuckDB
  * analog).
  */
object StreamingRunner {

  /** events schema as readStream needs it declared up front; ts arrives
    * as nanos-long (see [[graft.Tables.events]]) and is converted. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state (§2.12 `flatMapGroupsWithState`): per-user
    * running totals maintained in GroupState across micro-batches —
    * the arbitrary-state API the session/window builtins don't cover.
    * Emits the updated totals for each user seen in a batch. */
  def runStatefulTotals(spark: SparkSession, dir: String, queryName: String = "graft_state"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"), col("value"))
      .as[UserEvent]
    def update(uid: Long, batch: Iterator[UserEvent],
        state: GroupState[UserTotals]): Iterator[UserTotals] = {
      val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
      val events = batch.toSeq
      val next = UserTotals(uid,
        prev.n_events + events.size,
        prev.total_value + events.map(_.value).sum)
      state.update(next)
      Iterator.single(next)
    }
    val q = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Streaming dropDuplicates with watermark (§2.12): exactly-once by
    * (user_id, event_type, minute) inside the watermark horizon — the
    * streaming form of EventWindows.dedupWithinWatermark (which keeps
    * min event_id; streaming keeps first-arrival, so parity is on the
    * KEY SET, not the representative). */
  def runStreamingDedup(spark: SparkSession, dir: String, queryName: String = "graft_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val deduped = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("minute_us", unix_micros(col("ts")) - unix_micros(col("ts")) % 60000000L)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type", "minute_us")
      .select(col("user_id"), col("event_type"), col("minute_us"))
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Stream-stream interval join (§2.12): views joined to the clicks
    * that follow them within 30 minutes for the same user — both sides
    * watermarked so state is bounded. Same join predicate as the batch
    * form in StreamingSpec's parity assertion. */
  def runStreamStreamJoin(spark: SparkSession, dir: String, queryName: String = "graft_ssj"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def side(kind: String, alias: String) = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .filter(col("event_type") === kind)
      .select(col("user_id").as(s"${alias}_user"), col("event_id").as(s"${alias}_id"),
        col("ts").as(s"${alias}_ts"))
      .withWatermark(s"${alias}_ts", "1 hour")
    val joined = side("view", "v").join(side("click", "c"),
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("v_id"), col("c_id"),
        unix_micros(col("v_ts")).as("v_ts_us"), unix_micros(col("c_ts")).as("c_ts_us"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Run the tumbling-window aggregation as a real stream over the
    * events parquet (file-source), watermarked, into a memory sink;
    * returns the materialized result. */
  def runTumblingStream(spark: SparkSession, dir: String, queryName: String = "graft_stream"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Exact.exactSum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** documents schema as a file stream declares it. */
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  /** Streaming document chunking (§2.12 × §2.9): documents arrive as a
    * file stream, each micro-batch runs the semantic splitter and
    * appends its chunks to the sink. The chunker is document-local
    * (zero cross-document state), so batch and streaming results are
    * identical by construction — StreamingSpec asserts it. This is the
    * continuous-ingest shape of the reference's per-file ETL loop
    * (etl_processor.py:171-207) at cluster scale. */
  def runStreamingChunks(spark: SparkSession, srcDir: String, outDir: String,
      queryName: String = "graft_chunks"): Unit = {
    val q = spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.chunk.SemanticChunker.semanticChunkTableOf(batch)
          .write.mode("append").parquet(outDir)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Streaming EXACT DEDUP against an accumulating fingerprint index —
    * the online form of the batch dedup: each micro-batch fingerprints
    * its documents (portable md5 of the text bytes, plus the int64
    * prefix as the table's stats key so file-level skipping applies to
    * the dedup index itself), drops what the index has already seen
    * via a left-anti join, and APPENDS only the novel rows as one
    * atomic snapshot commit. Re-delivered or cross-batch duplicate
    * documents land exactly once; a crashed batch leaves the index at
    * its previous version. Scale shape: the anti-join shuffles on the
    * fingerprint key only (fingerprint + doc_id, never text); the
    * seen side is a PER-KEY probe —
    * [[graft.sources.SnapshotTable.readKeys]] of the batch's distinct
    * fp_keys — because fp_key is md5-derived: even a 10-row batch's
    * [min, max] ENVELOPE spans essentially the whole int64 space, so
    * range pruning is hollow for uniform keys and only a point-set
    * probe actually skips files. The key collect is bounded by
    * `maxProbeKeys` (limit(cap+1) detection, the merge path's own
    * idiom); a batch beyond the cap falls back to reading the full
    * index (correct, just unpruned — and a batch that large is
    * index-sized anyway). The probe prunes nothing until maintenance
    * has CLUSTERED the index into disjoint fp_key ranges — freshly
    * appended batch files each span the whole space; post-compaction
    * a micro-batch touches only the files its keys land in
    * (StreamingSpec proves the file-count drop). The append skips
    * committing via the footer row counts
    * ([[graft.sources.SnapshotTable.appendIfNonEmpty]]) when the whole
    * batch was duplicates — no count action, no no-op version.
    *
    * MAINTENANCE: with `maintainEvery` > 0, every Nth micro-batch is
    * followed by CLUSTERED compact → expire → vacuum — without it a
    * long-running ingest appends one file batch per novel micro-batch
    * and the index's file count (and with it every probe's manifest
    * scan) grows without bound. Clustering by fp_key re-sorts the
    * accumulated index into disjoint fingerprint ranges, so the
    * readRange probe above degrades from "files whose accumulated
    * range happens to intersect" back to "exactly the files the
    * batch's keys land in". Serialized inside foreachBatch like the
    * upsert loop — the single-writer contract is what makes the
    * zero-age vacuum safe.
    *
    * TTL (`ttlBatches` > 0, requires maintenance): rows remember the
    * micro-batch that ingested them (`batch_seq`), and each
    * maintenance cycle EVICTS fingerprints older than `ttlBatches`
    * batches via [[graft.sources.SnapshotTable.retainWhere]] (op
    * "rewrite" in history — eviction never masquerades as
    * compaction). This bounds the index's ROW count over an unbounded
    * stream: dedup becomes exactly-once within the TTL horizon, and
    * content re-delivered after its fingerprint expired is
    * deliberately re-admitted — the bounded-state trade every
    * infinite-stream dedup must choose, made explicit. Corpus dedup
    * (default ttlBatches = 0) keeps the index complete forever. */
  def runStreamingDedupIngest(spark: SparkSession, srcDir: String,
      indexRoot: String, queryName: String = "graft_dedup_ingest",
      maintainEvery: Int = 0, keepVersions: Int = 3,
      compactTargetFiles: Int = 4, ttlBatches: Int = 0): Unit = {
    require(ttlBatches == 0 || maintainEvery > 0,
      "TTL eviction runs inside the maintenance cycle — set maintainEvery")
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seq = nBatches.incrementAndGet()
        val fresh = graft.sources.SnapshotTable.versions(spark, indexRoot).isEmpty
        // persist: the batch fingerprints feed the bounds probe, the
        // anti-join, and the append — one materialization, three reads
        val base = batch
          .withColumn("fp", md5(col("text").cast("binary")))
          .withColumn("fp_key", graft.text.TextFunctions.md5Long(col("text")))
          .select(col("fp_key"), col("fp"), col("doc_id"), col("text"))
        val fp = (if (ttlBatches > 0) base.withColumn("batch_seq", lit(seq)) else base)
          .dropDuplicates("fp")
          .persist()
        try {
          if (fresh)
            graft.sources.SnapshotTable.create(spark, indexRoot, fp,
              statsKey = Some("fp_key"))
          else {
            val b = fp.agg(min(col("fp_key")), max(col("fp_key"))).head()
            if (!b.isNullAt(0)) { // null bounds = empty batch: nothing to do
              val seen = graft.sources.SnapshotTable
                .readRange(spark, indexRoot, b.getLong(0), b.getLong(1))
                .select(col("fp"))
              graft.sources.SnapshotTable.appendIfNonEmpty(spark, indexRoot,
                fp.join(seen, Seq("fp"), "left_anti"), statsKey = Some("fp_key"))
            }
          }
          if (maintainEvery > 0 && seq % maintainEvery == 0) {
            if (ttlBatches > 0)
              // eviction doubles as the compaction (same layout params)
              graft.sources.SnapshotTable.retainWhere(spark, indexRoot,
                col("batch_seq") >= seq - ttlBatches,
                targetFiles = compactTargetFiles, statsKey = Some("fp_key"),
                cluster = true)
            else
              graft.sources.SnapshotTable.compact(spark, indexRoot,
                targetFiles = compactTargetFiles, statsKey = Some("fp_key"),
                cluster = true)
            graft.sources.SnapshotTable.expireVersions(spark, indexRoot,
              keepLast = keepVersions)
            graft.sources.SnapshotTable.vacuum(spark, indexRoot, minAgeMs = 0L)
          }
        } finally fp.unpersist()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Streaming upsert into a TRANSACTIONAL index: each micro-batch of
    * reprocessed documents is chunked and merged into a
    * [[graft.sources.SnapshotTable]] by document key — the same J2
    * delete-then-add the batch pipeline uses, but each micro-batch lands as
    * one atomic snapshot commit. A failed batch leaves the table at its
    * previous version (readers never see partial output), and a
    * re-delivered batch converges to the same rows because the merge is
    * key-idempotent — the foreachBatch exactly-once pattern backed by a
    * real commit protocol instead of blind parquet appends.
    *
    * MAINTENANCE LOOP: with `maintainEvery` > 0, every Nth micro-batch
    * is followed by compact → expireVersions(keepVersions) → vacuum.
    * Without it a long-running stream is the reference's
    * write-through-then-never-compact gap (index_manager.py:236)
    * inverted: every merge adds files and manifests, so file count —
    * and with it scan cost — grows without bound. The maintenance runs
    * INSIDE foreachBatch, i.e. serialized with the upserts by the
    * streaming engine itself, which is what makes the zero-age vacuum
    * safe here: no concurrent writer's in-flight batch exists to be
    * swept. Multi-writer deployments should vacuum separately with the
    * default retention floor instead. */
  def runStreamingIndexUpsert(spark: SparkSession, srcDir: String,
      indexRoot: String, queryName: String = "graft_snap_upsert",
      maintainEvery: Int = 0, keepVersions: Int = 3,
      compactTargetFiles: Int = 4,
      chunker: DataFrame => DataFrame = defaultChunker): Unit = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val chunks = chunker(batch)
        if (graft.sources.SnapshotTable.versions(spark, indexRoot).isEmpty)
          graft.sources.SnapshotTable.create(spark, indexRoot, chunks,
            statsKey = Some("doc_id"))
        else
          graft.sources.SnapshotTable.merge(spark, indexRoot, chunks, "doc_id")
        if (maintainEvery > 0 && nBatches.incrementAndGet() % maintainEvery == 0) {
          // cluster = true: compaction also re-sorts the table into
          // disjoint doc_id ranges, restoring the pruning power the
          // interleaved incremental merges eroded — the next merges
          // rewrite only the files their keys actually land in
          graft.sources.SnapshotTable.compact(spark, indexRoot,
            targetFiles = compactTargetFiles, statsKey = Some("doc_id"),
            cluster = true)
          graft.sources.SnapshotTable.expireVersions(spark, indexRoot,
            keepLast = keepVersions)
          graft.sources.SnapshotTable.vacuum(spark, indexRoot, minAgeMs = 0L)
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** The stock micro-batch→chunks projection for
    * [[runStreamingIndexUpsert]]. A custom `chunker` is the schema
    * evolution surface: a redeployed stream whose chunker emits a new
    * column (quality score, source tag) merges into the SAME index
    * root — the snapshot table evolves its recorded schema at that
    * commit, pre-evolution versions keep reading with their own
    * schemas, and pre-evolution files null-fill the new column
    * (StreamingSpec proves the composition across stream runs). */
  private def defaultChunker(batch: DataFrame): DataFrame =
    graft.chunk.Chunking.chunkTable(batch)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
}
