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

  /** events schema as readStream needs it declared up front — probed
    * from the file's own footer (one driver-side batch-schema read)
    * because the generator's `ts` encoding has CHANGED across rounds
    * (nanos-long vs TIMESTAMP_NTZ micros; see [[graft.Tables.events]]):
    * a hard-coded type would mis-declare one of them, and the streaming
    * source trusts the declared schema blind. `ts` is then normalized
    * by the same [[graft.Tables.normalizeEventTs]] the batch reader
    * uses, so stream/batch parity never depends on the encoding. */
  private def eventsSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // memoized footer read (graft.Tables) — schema inference dispatches
    // a one-task Spark job per call on Spark 4, a fixed per-invocation
    // tax every streaming gate paid on top of its micro-batches
    graft.Tables.cachedSchema(spark, s"$dir/events.parquet")
  }

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
      .schema(eventsSchema(spark, dir))
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
      .schema(eventsSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Tables.normalizeEventTs)
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
      .schema(eventsSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Tables.normalizeEventTs)
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
      .schema(eventsSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Tables.normalizeEventTs)
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

  /** The FULL incremental loop: follow a snapshot DOCUMENTS table (the
    * [[SnapshotTableSourceProvider]] source — committed versions become
    * micro-batches) and maintain a derived CHUNKS snapshot table, one
    * atomic MERGE per batch keyed by doc_id. Everything is
    * exactly-once twice over: the source replays deterministically
    * from the checkpointed version, and the keyed merge makes the sink
    * idempotent even against re-delivery — re-chunking a document
    * replaces its chunks, never duplicates them. `AvailableNow` makes
    * this a RESUMABLE refresh job: each call drains exactly the
    * versions committed since the last call and stops — the push-shaped
    * form of the reference's skip-if-converted incremental pass
    * (document_processor.py:139-151): new documents chunk, existing
    * derived rows are never recomputed. At 100 TB the per-call cost is
    * the appended documents' chunking plus a merge bounded by the
    * files those doc_ids land in — table size never enters. */
  def runTableFollowChunks(spark: SparkSession, docsRoot: String,
      chunksRoot: String, checkpointDir: String): Unit = {
    val q = spark.readStream.format("graft-table").option("path", docsRoot).load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a compact-only window delivers an empty batch: chunking it
        // would commit an empty merge — version churn for nothing
        if (!batch.isEmpty) {
          val chunks = graft.chunk.SemanticChunker.semanticChunkTableOf(batch)
          if (graft.sources.SnapshotTable.versions(spark, chunksRoot).isEmpty)
            graft.sources.SnapshotTable.create(spark, chunksRoot, chunks,
              statsKey = Some("doc_id"))
          else
            graft.sources.SnapshotTable.merge(spark, chunksRoot, chunks, key = "doc_id")
        }
        ()
      }
      .start()
    q.awaitTermination()
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
    * [[graft.sources.SnapshotTable.readKeysStr]] of the batch's
    * distinct fingerprints, pruning DIRECTLY on the `fp` column's
    * binary manifest stats (format 3) — no derived int64 side-channel
    * column: the index key IS the fingerprint. Point probes are the
    * only pruning that works here — md5-uniform keys make even a
    * 10-row batch's [min, max] ENVELOPE span essentially the whole
    * space. The key collect is bounded by `maxProbeKeys`
    * (limit(cap+1) detection, the merge path's own idiom); a batch
    * beyond the cap falls back to reading the full index (correct,
    * just unpruned — and a batch that large is index-sized anyway).
    * The probe prunes nothing until maintenance has CLUSTERED the
    * index into disjoint fingerprint ranges — freshly appended batch
    * files each span the whole space; post-compaction a micro-batch
    * touches only the files its keys land in (StreamingSpec proves
    * the file-count drop). An index built by an older build (keyed on
    * the derived `fp_key` column) keeps working: the stats-identity
    * check degrades the probe to a full read until the first
    * maintenance cycle re-keys the stats onto `fp`. The append skips
    * committing via the footer row counts
    * ([[graft.sources.SnapshotTable.appendIfNonEmpty]]) when the whole
    * batch was duplicates — no count action, no no-op version.
    *
    * MAINTENANCE: with `maintainEvery` > 0, every Nth micro-batch is
    * followed by CLUSTERED compact → expire → vacuum — without it a
    * long-running ingest appends one file batch per novel micro-batch
    * and the index's file count (and with it every probe's manifest
    * scan) grows without bound. Clustering by fingerprint re-sorts the
    * accumulated index into disjoint fingerprint ranges, so the probe
    * above degrades from "files whose accumulated range happens to
    * intersect" back to "exactly the files the batch's keys land in".
    * Serialized inside foreachBatch like the
    * upsert loop — the single-writer contract is what makes the
    * zero-age vacuum safe.
    *
    * TTL (`ttlBatches` > 0, requires maintenance): rows remember the
    * micro-batch that ingested them (`batch_seq`), and each
    * maintenance cycle EVICTS fingerprints older than `ttlBatches`
    * batches via [[graft.sources.SnapshotTable.deleteWhere]] — a
    * deletion-vector commit (op "delete" in history: the row drop is
    * honest to CDC and costs bytes ∝ rows EXPIRED, not a rewrite of
    * every file that holds a surviving row), followed by
    * [[graft.sources.SnapshotTable.compactSmall]] (packs the fresh
    * micro-batch files, re-clustered on `fp`; materializes their dv
    * debt as a side effect of its effective read) and
    * [[graft.sources.SnapshotTable.materializeDv]] (rewrites any
    * LARGE file whose deletion fraction crossed `maxDvFraction` —
    * the one debt shape the first two leave behind). The cycle's
    * total cost tracks the CHANGE rate (expired rows + fresh files +
    * over-bound debt), never the index size — the difference between
    * maintenance that reads 100 TB and maintenance that reads the
    * last hour. This bounds the index's ROW count over an unbounded
    * stream: dedup becomes exactly-once within the TTL horizon, and
    * content re-delivered after its fingerprint expired is
    * deliberately re-admitted — the bounded-state trade every
    * infinite-stream dedup must choose, made explicit. Corpus dedup
    * (default ttlBatches = 0) keeps the index complete forever.
    * Restart-safe: the sequence counter SEEDS from max(batch_seq)
    * already in the index (one metadata-cheap aggregate at stream
    * start), so a restarted stream continues the sequence instead of
    * resetting to zero — a reset would hold every pre-restart row past
    * its horizon forever. Rows WITHOUT a batch_seq (ingested before
    * TTL was enabled on this index; the column null-fills) are treated
    * as CURRENT at every cycle — the pre-TTL legacy set is RETAINED
    * indefinitely (finite and frozen, so state stays bounded; stamped
    * rows age out normally around it) —
    * never as already-expired: evicting the entire pre-TTL index on
    * the first maintenance cycle would silently re-admit every
    * duplicate it knew about. */
  def runStreamingDedupIngest(spark: SparkSession, srcDir: String,
      indexRoot: String, queryName: String = "graft_dedup_ingest",
      maintainEvery: Int = 0, keepVersions: Int = 3,
      compactTargetFiles: Int = 4, ttlBatches: Int = 0,
      maxProbeKeys: Int = 100000, smallBytes: Long = 8L * 1024 * 1024,
      maxDvFraction: Double = 0.25): Unit = {
    require(ttlBatches == 0 || maintainEvery > 0,
      "TTL eviction runs inside the maintenance cycle — set maintainEvery")
    // resume the batch sequence where the index left it: max(batch_seq)
    // survives restarts in the table itself, so the TTL horizon keeps
    // moving instead of restarting from zero under old rows
    val seq0 =
      if (ttlBatches > 0 && graft.sources.SnapshotTable.versions(spark, indexRoot).nonEmpty) {
        val idx = graft.sources.SnapshotTable.read(spark, indexRoot)
        if (idx.columns.contains("batch_seq"))
          Option(idx.agg(max(col("batch_seq"))).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
        else 0L
      } else 0L
    val nBatches = new java.util.concurrent.atomic.AtomicLong(seq0)
    val q = spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seq = nBatches.incrementAndGet()
        val fresh = graft.sources.SnapshotTable.versions(spark, indexRoot).isEmpty
        // persist: the batch fingerprints feed the key collect, the
        // anti-join, and the append — one materialization, three reads
        val base = batch
          .withColumn("fp", md5(col("text").cast("binary")))
          .select(col("fp"), col("doc_id"), col("text"))
        val fp = (if (ttlBatches > 0) base.withColumn("batch_seq", lit(seq)) else base)
          .dropDuplicates("fp")
          .persist()
        try {
          if (fresh)
            // statsKey2 on the TTL column: every file's batch_seq
            // range rides the manifest, so the eviction deleteWhere's
            // planning-time pruning skips files whose whole range is
            // inside the horizon — fresh files stop being scanned by
            // a maintenance pass that can't evict them anyway
            graft.sources.SnapshotTable.create(spark, indexRoot, fp,
              statsKey = Some("fp"),
              statsKey2 = if (ttlBatches > 0) Some("batch_seq") else None,
              bloomKey = true)
          else {
            // per-key probe ON THE FINGERPRINT ITSELF (binary manifest
            // stats): md5-uniform keys make any [min,max] envelope
            // span ~the whole key space, so only the exact point set
            // prunes. limit(cap+1): the driver never holds more than
            // cap+1 keys, and the extra row is how "too many to prune
            // with" is detected (fall back to the full index)
            val ks = fp.select(col("fp")).limit(maxProbeKeys + 1)
              .collect().map(_.getString(0))
            if (ks.nonEmpty) { // empty batch: nothing to do
              val seen = (if (ks.length > maxProbeKeys)
                graft.sources.SnapshotTable.read(spark, indexRoot)
              else
                graft.sources.SnapshotTable.readKeysStr(spark, indexRoot, "fp", ks))
                .select(col("fp"))
              // bloomKey: fresh (unclustered) index files carry a
              // per-file bloom over fp, so the NEXT batches' point
              // probes prune them before maintenance ever re-clusters
              graft.sources.SnapshotTable.appendIfNonEmpty(spark, indexRoot,
                fp.join(seen, Seq("fp"), "left_anti"), statsKey = Some("fp"),
                bloomKey = true)
            }
          }
          if (maintainEvery > 0 && seq % maintainEvery == 0) {
            // TTL needs the batch_seq column to exist in the table
            // schema — an index predating TTL enablement gains it at
            // the first novel append; until then (all-duplicate
            // batches) eviction has nothing to key on and compaction
            // runs instead (schema check = one manifest read, no job)
            if (ttlBatches > 0 &&
                graft.sources.SnapshotTable.read(spark, indexRoot)
                  .columns.contains("batch_seq")) {
              // INCREMENTAL eviction cycle — no whole-table rewrite:
              // expired rows go as a deletion-vector commit (write
              // cost ∝ rows expired; op "delete", so history and CDC
              // are honest about the row drop); compactSmall then
              // packs the fresh micro-batch files (materializing
              // their dv debt as a side effect of its effective
              // read); materializeDv rewrites any LARGE file whose
              // accumulated deletion fraction crossed the bound —
              // the only remaining debt shape after the first two.
              // coalesce: null batch_seq = pre-TTL rows age as if
              // ingested NOW, not as if expired
              graft.sources.SnapshotTable.deleteWhere(spark, indexRoot,
                coalesce(col("batch_seq"), lit(seq)) < seq - ttlBatches)
              // zero-age vacuum: safe ONLY under this loop's
              // single-writer foreachBatch serialization
              graft.sources.SnapshotTable.maintain(spark, indexRoot,
                smallBytes = smallBytes, maxDvFraction = maxDvFraction,
                keepVersions = keepVersions, statsKey = Some("fp"),
                cluster = true, minAgeMs = 0L)
            } else {
              graft.sources.SnapshotTable.compact(spark, indexRoot,
                targetFiles = compactTargetFiles, statsKey = Some("fp"),
                cluster = true)
              graft.sources.SnapshotTable.expireVersions(spark, indexRoot,
                keepLast = keepVersions)
              graft.sources.SnapshotTable.vacuum(spark, indexRoot, minAgeMs = 0L)
            }
          }
        } finally fp.unpersist()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** [[documentsSchema]] plus an event-time column (`ts`, microseconds
    * since epoch) — the arrival shape of a timestamped content feed. */
  private val timedDocumentsSchema = StructType(
    documentsSchema.fields :+ StructField("ts", LongType))

  /** [[runStreamingDedupIngest]] with an EVENT-TIME TTL: rows carry
    * their event timestamp (`event_ts`), the stream maintains a
    * monotone HIGH-WATER MARK (max event time observed — the same
    * quantity a watermark derives from), and each maintenance cycle
    * evicts fingerprints whose event time has fallen more than
    * `ttlMicros` behind it. A real pipeline ages content by TIME, not
    * by how many micro-batches happened to fire: a quiet night of
    * near-empty batches must not expire yesterday's fingerprints the
    * way a batch-count TTL would, and a catch-up burst must not
    * stretch the horizon.
    *
    * Semantics at the horizon: content RE-DELIVERED while its
    * fingerprint is inside the horizon (late arrivals included — a
    * late row's own event_ts being old doesn't matter, the PROBE is by
    * fingerprint) dedups; content arriving after its fingerprint's
    * event time fell off the horizon re-admits — the same explicit
    * bounded-state trade as the batch-count TTL, now denominated in
    * event time. The horizon keys on FIRST-sighting event time:
    * a duplicate inside the horizon is dropped by the anti-join and
    * therefore does NOT refresh its fingerprint's stamp (deterministic
    * and cheap; sliding-refresh semantics would need a merge per
    * batch instead of an append).
    *
    * Restart-safe the same way as the batch-count TTL: the high-water
    * mark seeds from max(event_ts) already in the index, so a restart
    * cannot rewind the horizon under old rows; pre-event-time rows
    * (null event_ts) are retained indefinitely, never treated as
    * expired. */
  def runStreamingDedupIngestEventTime(spark: SparkSession, srcDir: String,
      indexRoot: String, queryName: String = "graft_dedup_ett",
      maintainEvery: Int = 3, keepVersions: Int = 3,
      compactTargetFiles: Int = 4, ttlMicros: Long = 24L * 3600 * 1000000,
      maxProbeKeys: Int = 100000, smallBytes: Long = 8L * 1024 * 1024,
      maxDvFraction: Double = 0.25): Unit = {
    require(maintainEvery > 0, "event-time TTL runs inside the maintenance cycle")
    require(ttlMicros > 0, "ttlMicros must be positive")
    val snap = graft.sources.SnapshotTable
    val hwm0 =
      if (snap.versions(spark, indexRoot).nonEmpty) {
        val idx = snap.read(spark, indexRoot)
        if (idx.columns.contains("event_ts"))
          Option(idx.agg(max(col("event_ts"))).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
        else Long.MinValue
      } else Long.MinValue
    val hwm = new java.util.concurrent.atomic.AtomicLong(hwm0)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(timedDocumentsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seq = nBatches.incrementAndGet()
        val fresh = snap.versions(spark, indexRoot).isEmpty
        val fp = batch
          .withColumn("fp", md5(col("text").cast("binary")))
          .select(col("fp"), col("doc_id"), col("text"),
            col("ts").as("event_ts"))
          .dropDuplicates("fp")
          .persist()
        try {
          // one bounded collect feeds BOTH the per-key probe and the
          // high-water-mark advance — no separate max(ts) action
          val keyTs = fp.select(col("fp"), col("event_ts"))
            .limit(maxProbeKeys + 1)
            .collect().map(r => (r.getString(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
          if (keyTs.nonEmpty) {
            // under the cap the collect is COMPLETE, so its max is the
            // batch max for free; a TRUNCATED (over-cap) collect may
            // have dropped the true max, which would under-advance the
            // horizon and hold state past its TTL arbitrarily long —
            // that rare path pays one tiny agg on the persisted frame
            // for the exact value
            val batchMax =
              if (keyTs.length <= maxProbeKeys) keyTs.map(_._2).max
              else Option(fp.agg(max(col("event_ts"))).head().get(0))
                .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
            hwm.updateAndGet(m => math.max(m, batchMax))
            if (fresh)
              // event_ts as the secondary stats column — the same
              // eviction-scan pruning as the batch-count TTL's
              // batch_seq (see runStreamingDedupIngest)
              snap.create(spark, indexRoot, fp, statsKey = Some("fp"),
                statsKey2 = Some("event_ts"), bloomKey = true)
            else {
              val seen = (if (keyTs.length > maxProbeKeys)
                snap.read(spark, indexRoot)
              else
                snap.readKeysStr(spark, indexRoot, "fp", keyTs.map(_._1)))
                .select(col("fp"))
              snap.appendIfNonEmpty(spark, indexRoot,
                fp.join(seen, Seq("fp"), "left_anti"), statsKey = Some("fp"),
                bloomKey = true)
            }
          }
          if (seq % maintainEvery == 0 && !snap.versions(spark, indexRoot).isEmpty) {
            val horizon = hwm.get() - ttlMicros
            if (hwm.get() != Long.MinValue &&
                snap.read(spark, indexRoot).columns.contains("event_ts")) {
              // same incremental cycle as the batch-count TTL: dv
              // delete (cost ∝ expired rows, op "delete") + pack the
              // fresh small files + materialize over-bound big-file
              // debt. nulls (pre-event-time rows) are retained, same
              // contract as the batch-count TTL's legacy set
              snap.deleteWhere(spark, indexRoot,
                coalesce(col("event_ts"), lit(Long.MaxValue)) < horizon)
              // zero-age vacuum: safe ONLY under this loop's
              // single-writer foreachBatch serialization
              snap.maintain(spark, indexRoot, smallBytes = smallBytes,
                maxDvFraction = maxDvFraction, keepVersions = keepVersions,
                statsKey = Some("fp"), cluster = true, minAgeMs = 0L)
            } else {
              snap.compact(spark, indexRoot,
                targetFiles = compactTargetFiles, statsKey = Some("fp"),
                cluster = true)
              snap.expireVersions(spark, indexRoot, keepLast = keepVersions)
              snap.vacuum(spark, indexRoot, minAgeMs = 0L)
            }
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
