package graft

import org.apache.spark.sql.functions._

/** Streaming operators run under a real readStream (§2.12): the
  * streaming tumbling aggregation must equal the batch form. */
class StreamingSpec extends SparkSpec {

  test("table as a streaming source: versions become micro-batches, exactly-once across restart") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tsrc").toString
    val root = s"$tmp/table"
    val cp = s"$tmp/cp"
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    sources.SnapshotTable.create(spark, root, rows(1L -> "a", 2L -> "b")) // v1
    sources.SnapshotTable.append(spark, root, rows(3L -> "c"))            // v2
    def drain(name: String): Set[(Long, String)] = {
      // foreachBatch (not the memory sink): the point of this test is
      // RESUMING from the checkpoint, which the memory sink refuses
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
      val q = spark.readStream.format("graft-table").option("path", root).load()
        .writeStream.queryName(name)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Long, String)].collect().foreach(got.add)
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    // first run consumes everything committed so far, via shortName
    // resolution (META-INF service registration)
    assert(drain("tsrc_run1") == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // compact commits a version but must deliver NOTHING new;
    // the next append must arrive exactly once
    sources.SnapshotTable.compact(spark, root, targetFiles = 1)           // v3
    sources.SnapshotTable.append(spark, root, rows(4L -> "d"))            // v4
    assert(drain("tsrc_run2") == Set(4L -> "d"),
      "a restarted stream resumes from the checkpointed version: no re-delivery, no loss")
    // nothing new: the drained stream delivers nothing
    assert(drain("tsrc_run3") == Set.empty)
  }

  test("table source maxVersionsPerTrigger bounds catch-up; pacing survives restart") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tpace").toString
    val root = s"$tmp/table"
    val cp = s"$tmp/cp"
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    sources.SnapshotTable.create(spark, root, rows(1L -> "a"))   // v1
    Seq(2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
      .foreach(r => sources.SnapshotTable.append(spark, root, rows(r))) // v2..v5
    def drain(name: String): (Seq[Int], Set[(Long, String)]) = {
      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
      val q = spark.readStream.format("graft-table")
        .option("path", root).option("maxVersionsPerTrigger", "2").load()
        .writeStream.queryName(name)
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rs = batch.as[(Long, String)].collect()
          if (rs.nonEmpty) { sizes.add(rs.length); rs.foreach(got.add) }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      (sizes.asScala.toSeq, got.asScala.toSet)
    }
    // catch-up over 5 pending versions at 1 row/version: the throttle
    // must split it into ≤2-version batches instead of one 5-version
    // batch — the bounded unit of work AND of retry
    val (sizes1, got1) = drain("tpace_run1")
    assert(got1 == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    assert(sizes1.nonEmpty && sizes1.forall(_ <= 2),
      s"each catch-up batch must span at most 2 versions, got $sizes1")
    assert(sizes1.length >= 3, s"5 versions at ≤2/trigger is ≥3 batches, got $sizes1")
    // restart: the pace marker log resumes the floor at the delivered
    // head — offsets never regress, nothing re-delivers, and the new
    // versions still arrive throttled
    Seq(6L -> "f", 7L -> "g", 8L -> "h")
      .foreach(r => sources.SnapshotTable.append(spark, root, rows(r))) // v6..v8
    val (sizes2, got2) = drain("tpace_run2")
    assert(got2 == Set(6L -> "f", 7L -> "g", 8L -> "h"),
      s"exactly-once across restart under pacing: $got2")
    assert(sizes2.forall(_ <= 2) && sizes2.length >= 2,
      s"restart must keep throttling (3 versions → ≥2 batches of ≤2): $sizes2")
  }

  test("table source maxBytesPerTrigger packs catch-up versions by manifest bytes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tbyte").toString
    val root = s"$tmp/table"
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id"), col("id").cast("string").as("v")).coalesce(1)
    sources.SnapshotTable.create(spark, root, rows(0, 500))             // v1
    (1 to 3).foreach(i =>
      sources.SnapshotTable.append(spark, root, rows(i * 500, i * 500 + 500))) // v2..v4
    val perVersion = sources.SnapshotTable
      .addedBytesByVersion(spark, root, 0, 4).map(_._2)
    assert(perVersion.forall(_ > 0))
    def drain(cp: String, budget: Long): Int = {
      val batches = new java.util.concurrent.atomic.AtomicInteger()
      val total = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("graft-table")
        .option("path", root).option("maxBytesPerTrigger", budget.toString).load()
        .writeStream.queryName(s"tbyte_$budget")
        .option("checkpointLocation", s"$tmp/$cp")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = batch.count()
          if (n > 0) { batches.incrementAndGet(); total.addAndGet(n); () }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(total.get() == 2000L, s"all rows must arrive, got ${total.get()}")
      batches.get()
    }
    // budget below any single version: every version drains alone
    // (soft cap — the first version past the floor always admits)
    assert(drain("cp1", 1L) == 4)
    // budget of two near-equal versions (+jitter slack): pairs → 2 batches
    assert(drain("cp2", perVersion(0) + perVersion(1) + 64L) == 2)
  }

  test("follow pipeline: a derived chunk table tracks the documents table incrementally") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-follow").toString
    val docsRoot = s"$tmp/docs"
    val chunksRoot = s"$tmp/chunks"
    val cp = s"$tmp/cp"
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    sources.SnapshotTable.create(spark, docsRoot,
      all.filter(col("doc_id") < 100L), statsKey = Some("doc_id"))
    streaming.StreamingRunner.runTableFollowChunks(spark, docsRoot, chunksRoot, cp)
    val afterFirst = sources.SnapshotTable.read(spark, chunksRoot)
      .select(countDistinct(col("doc_id"))).as[Long].head()
    sources.SnapshotTable.append(spark, docsRoot, all.filter(col("doc_id") >= 100L))
    streaming.StreamingRunner.runTableFollowChunks(spark, docsRoot, chunksRoot, cp)
    // the derived table equals chunking the WHOLE corpus in batch —
    // but only the second slice was chunked by the second call
    val streamed = sources.SnapshotTable.read(spark, chunksRoot)
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect().toSet
    val batch = graft.chunk.SemanticChunker.semanticChunkTableOf(all)
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect().toSet
    assert(streamed == batch)
    assert(afterFirst < streamed.map(_._1).size.toLong,
      "the first call must have chunked only the first slice")
    // a third call with nothing new commits nothing (no version churn),
    // and a compact-only window (empty batch) is likewise silent
    val versionsBefore = sources.SnapshotTable.versions(spark, chunksRoot)
    streaming.StreamingRunner.runTableFollowChunks(spark, docsRoot, chunksRoot, cp)
    sources.SnapshotTable.compact(spark, docsRoot, targetFiles = 1)
    streaming.StreamingRunner.runTableFollowChunks(spark, docsRoot, chunksRoot, cp)
    assert(sources.SnapshotTable.versions(spark, chunksRoot) == versionsBefore,
      "empty and compact-only windows must not commit to the derived table")
  }

  test("incremental view tracks a table fed by the streaming sink") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivstream").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val vw = s"$tmp/view"
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 10).as("g"), col("n_chars"))
    sources.SnapshotTable.create(spark, src,
      all.filter(col("doc_id") < 200L), statsKey = Some("doc_id"))
    def mirror(): Unit = {
      val q = spark.readStream.format("graft-table").option("path", src).load()
        .writeStream.format("graft-table").option("path", dst)
        .option("statsKey", "doc_id")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def recompute() = sources.SnapshotTable.read(spark, dst).groupBy(col("g"))
      .agg(count(lit(1)).as("view_cnt"), sum(col("n_chars")).as("view_sum"))
    def viewMatches(): Boolean = {
      val v = meta.IncrementalView.read(spark, vw); val r = recompute()
      v.exceptAll(r).isEmpty && r.exceptAll(v).isEmpty
    }
    mirror()
    meta.IncrementalView.create(spark, dst, vw, "g", "n_chars")
    assert(viewMatches())
    // two upstream appends arrive through the streaming sink; the view
    // catches up on the CDC of the SINK's commits, not the source's
    sources.SnapshotTable.append(spark, src,
      all.filter(col("doc_id") >= 200L && col("doc_id") < 350L))
    mirror()
    assert(meta.IncrementalView.refresh(spark, dst, vw) >= 1)
    assert(viewMatches())
    sources.SnapshotTable.append(spark, src, all.filter(col("doc_id") >= 350L))
    mirror()
    mirror() // drained replay: sink commits nothing
    assert(meta.IncrementalView.refresh(spark, dst, vw) >= 1)
    assert(meta.IncrementalView.refresh(spark, dst, vw) == 0)
    assert(viewMatches())
    Scratch.deleteRecursively(tmp)
  }

  test("table streaming sink: txnBatchId makes a replayed batch a no-op (exactly-once)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-tsink").toString + "/t"
    val sink = new streaming.SnapshotTableSink(spark, root, Some("id"), None)
    // plain batch frames: asBatch re-wraps them harmlessly (the REAL
    // streaming-flagged path is exercised by the mirror test below,
    // where the engine itself hands the sink its micro-batch frames)
    def batch(r: (Long, String)*) = r.toDF("id", "v")
    sink.addBatch(0L, batch(1L -> "a", 2L -> "b"))
    sink.addBatch(1L, batch(3L -> "c"))
    // the crash-replay shape: the engine re-runs the last batch after
    // a restart whose checkpoint commit never landed
    sink.addBatch(1L, batch(3L -> "c"))
    sink.addBatch(0L, batch(1L -> "a", 2L -> "b"))
    assert(sources.SnapshotTable.read(spark, root).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"), "replayed batches must not append twice")
    assert(sources.SnapshotTable.versions(spark, root) == Seq(1, 2),
      "replays commit nothing — not even empty versions")
    // maintenance between sink batches must not reset the cursor
    sources.SnapshotTable.compact(spark, root, targetFiles = 1)
    assert(sources.SnapshotTable.lastTxnBatchId(spark, root).contains(1L),
      "the cursor survives maintenance commits that carry no marker")
    sink.addBatch(1L, batch(9L -> "x"))
    assert(sources.SnapshotTable.read(spark, root).count() == 3,
      "a stale batch id after maintenance is still recognized")
    sink.addBatch(2L, batch(4L -> "d"))
    assert(sources.SnapshotTable.read(spark, root).count() == 4)
  }

  test("table-to-table mirror: source and sink compose into one-line replication") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mirror").toString
    val src = s"$tmp/src"
    val dst = s"$tmp/dst"
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    sources.SnapshotTable.create(spark, src, rows(1L -> "a", 2L -> "b"))
    def mirror(): Unit = {
      val q = spark.readStream.format("graft-table").option("path", src).load()
        .writeStream.format("graft-table").option("path", dst)
        .option("statsKey", "id")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    mirror()
    sources.SnapshotTable.append(spark, src, rows(3L -> "c"))
    mirror()
    mirror() // nothing new: no batch, no commit
    assert(sources.SnapshotTable.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // the mirror's own manifest stats work: it is a first-class table
    assert(sources.SnapshotTable.lastTxnBatchId(spark, dst).isDefined)
  }

  test("table streaming source in changeFeed mode delivers the CDC rows, merges included") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tsrccf").toString
    val root = s"$tmp/table"
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    sources.SnapshotTable.create(spark, root, rows(1L -> "a", 2L -> "b")) // v1
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String, Long, String)]()
    def drain(): Set[(Int, String, Long, String)] = {
      val q = spark.readStream.format("graft-table").option("path", root)
        .option("changeFeed", "true").load()
        .writeStream.option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Int, String, Long, String)].collect().foreach(got.add)
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    assert(drain() == Set((1, "insert", 1L, "a"), (1, "insert", 2L, "b")))
    got.clear()
    sources.SnapshotTable.merge(spark, root, rows(2L -> "B"), key = "id") // v2
    sources.SnapshotTable.compact(spark, root, targetFiles = 1)           // v3: silent
    sources.SnapshotTable.append(spark, root, rows(3L -> "c"))            // v4
    assert(drain() == Set(
      (2, "insert", 2L, "B"), (2, "delete", 2L, "b"),
      (4, "insert", 3L, "c")),
      "the resumed change feed carries the merge's delete+insert pair and nothing from the compact")
  }

  test("table streaming source refuses data-changing commits unless told to skip them") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tsrcm").toString
    val root = s"$tmp/table"
    def rows(r: (Long, String)*) = r.toDF("id", "v")
    sources.SnapshotTable.create(spark, root, rows(1L -> "a", 2L -> "b")) // v1
    sources.SnapshotTable.merge(spark, root, rows(2L -> "B"), key = "id") // v2: rewrite
    sources.SnapshotTable.append(spark, root, rows(3L -> "c"))            // v3
    def drain(name: String, cp: String, ignoreChanges: Boolean): Set[(Long, String)] = {
      val q = spark.readStream.format("graft-table").option("path", root)
        .option("ignoreChanges", ignoreChanges.toString).load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).as[(Long, String)].collect().toSet
    }
    // default: the merge poisons the window — fail loudly, not re-deliver
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain("tsrcm_fail", s"$tmp/cp1", ignoreChanges = false)
    }
    assert(e.getCause.getMessage.contains("merge"))
    // opt-in skip: the merge's rewritten files are passed over; the
    // create and the append still deliver
    assert(drain("tsrcm_skip", s"$tmp/cp2", ignoreChanges = true) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("flatMapGroupsWithState per-user totals equal batch groupBy") {
    import spark.implicits._
    val streamed = streaming.StreamingRunner
      .runStatefulTotals(spark, sf, "graft_state_spec")
      // take the LAST update per user (state evolves across batches)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
      .as[(Long, Long)].collect().toMap
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("streaming dropDuplicates-with-watermark yields the batch key set") {
    import spark.implicits._
    val streamed = streaming.StreamingRunner
      .runStreamingDedup(spark, sf, "graft_dedup_spec")
      .as[(Long, String, Long)].collect().toSet
    val batch = streaming.EventWindows.dedupWithinWatermark(spark, sf)
      .select("user_id", "event_type", "minute_us")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    val streamed = streaming.StreamingRunner
      .runStreamStreamJoin(spark, sf, "graft_ssj_spec")
      .orderBy("user_id", "v_id", "c_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the gated batch analog (`events_interval_join`) IS the
    // comparison side: one definition for oracle and streaming proof
    val batch = streaming.EventWindows.intervalJoin(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming tumbling window equals batch tumbling window") {
    val streamed = streaming.StreamingRunner
      .runTumblingStream(spark, sf, "graft_stream_spec")
      .orderBy(col("window_start_us"), col("event_type"))
      .collect().toSeq
    val batch = streaming.EventWindows.tumbling(spark, sf)
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming semantic chunking equals the batch chunk table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-schunk")
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/chunks"
    // split the documents into 3 files -> 3 micro-batches
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(3).write.parquet(srcDir)
    streaming.StreamingRunner.runStreamingChunks(spark, srcDir, outDir)
    val streamed = spark.read.parquet(outDir)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    val batch = chunk.SemanticChunker.semanticChunkTable(spark, sf)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup ingest: cross-batch and re-delivered duplicates land exactly once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // batch 1: two novel docs (one duplicated IN-batch under another id);
    // batch 2: a cross-batch duplicate + a novel doc;
    // batch 3: batch 1's doc re-delivered verbatim + a novel doc
    Seq(doc(1, "alpha text"), doc(9, "alpha text"), doc(2, "beta text"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(srcDir)
    Seq(doc(3, "beta text"), doc(4, "gamma text"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(srcDir)
    Seq(doc(1, "alpha text"), doc(5, "delta text"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(srcDir)
    streaming.StreamingRunner.runStreamingDedupIngest(spark, srcDir, indexRoot,
      queryName = "graft_sdedup")
    val idx = sources.SnapshotTable.read(spark, indexRoot)
    val texts = idx.select(col("text")).as[String].collect().sorted.toSeq
    assert(texts == Seq("alpha text", "beta text", "delta text", "gamma text"),
      "each distinct content must land exactly once across all batches")
    // fingerprints are unique by construction of the ingest
    assert(idx.select(col("fp")).distinct().count() == 4)
    // appends happened only for novelty: at most one version per batch
    val vs = sources.SnapshotTable.versions(spark, indexRoot)
    assert(vs.size <= 3)
    // and every post-create micro-batch append rode a FORMAT-8 DELTA:
    // the streaming hot path writes O(batch) manifest lines, not the
    // index's live file list — the commit-cost property that keeps a
    // 1M-file dedup index's ingest metadata O(batch) at 100 TB
    vs.drop(1).foreach { v =>
      val head = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(indexRoot, "_snapshots", f"v$v%07d.json")).get(0)
      assert(head.contains("\"base\""),
        s"micro-batch append v$v must be a delta manifest, got header $head")
    }
  }

  test("streaming upsert maintenance keeps file count bounded across 12 micro-batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-smaint")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    // 12 single-file source drops -> 12 micro-batches. Every batch
    // re-processes doc 0 (same text, so arrival order can't matter)
    // alongside one new doc — each merge both adds and rewrites.
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    (0 until 12).foreach { i =>
      Seq(doc(0L, "anchor " * 40), doc(i + 1L, s"payload-$i " * (20 + i)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    streaming.StreamingRunner.runStreamingIndexUpsert(spark, srcDir, indexRoot,
      queryName = "graft_smaint", maintainEvery = 4, keepVersions = 3)
    // maintenance ran last: version count is exactly keepVersions, and
    // after vacuum the data dir holds only files those versions name
    val versions = sources.SnapshotTable.versions(spark, indexRoot)
    assert(versions.size == 3, s"expire must keep 3 versions, got $versions")
    def parquetCount(dir: java.nio.file.Path): Int = {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val nFiles = parquetCount(java.nio.file.Paths.get(indexRoot, "data"))
    assert(nFiles <= 24,
      s"12 micro-batches with compact-every-4 must stay bounded, got $nFiles files")
    // every retained version stays readable...
    versions.foreach { v =>
      assert(sources.SnapshotTable.read(spark, indexRoot, Some(v)).count() > 0,
        s"version $v must remain readable after maintenance")
    }
    // ...and the latest read equals the batch-computed truth (doc 0's
    // text is batch-invariant, docs 1..12 each landed once)
    val expected = chunk.Chunking.chunkTable(
      Seq.tabulate(12)(i => doc(i + 1L, s"payload-$i " * (20 + i)))
        .:+(doc(0L, "anchor " * 40))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .as[(Long, Long, String)].collect().toSet
    val got = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == expected, "maintained index must equal the batch-computed chunk set")
  }

  test("streaming dedup ingest with maintenance: bounded file count, dedup set preserved across compactions") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdmaint")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // 12 micro-batches: one novel text each, plus the SAME anchor text
    // under fresh doc ids — re-delivered content must keep landing
    // exactly once even after maintenance rewrote the index files
    (0 until 12).foreach { i =>
      Seq(doc(i + 1L, s"novel-payload-$i " * 10), doc(100L + i, "anchor " * 20))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    streaming.StreamingRunner.runStreamingDedupIngest(spark, srcDir, indexRoot,
      queryName = "graft_sdmaint", maintainEvery = 4, keepVersions = 2)
    val versions = sources.SnapshotTable.versions(spark, indexRoot)
    assert(versions.size == 2, s"expire must keep 2 versions, got $versions")
    val texts = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("text")).as[String].collect().sorted.toSeq
    val expected = ((0 until 12).map(i => s"novel-payload-$i " * 10) :+ "anchor " * 20).sorted
    assert(texts == expected,
      "each distinct content exactly once — maintenance must not lose or duplicate fingerprints")
    def parquetCount(dir: java.nio.file.Path): Int = {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val nFiles = parquetCount(java.nio.file.Paths.get(indexRoot, "data"))
    assert(nFiles <= 16,
      s"12 ingest batches with compact-every-4 must stay bounded, got $nFiles files")
    versions.foreach { v =>
      assert(sources.SnapshotTable.read(spark, indexRoot, Some(v)).count() > 0,
        s"version $v must remain readable after maintenance")
    }
  }

  test("TTL eviction bounds dedup state: expired fingerprints re-admit re-delivered content") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sttl")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // batch 1: anchor content (doc 101); batches 2-7: one novel each;
    // batch 8: the SAME anchor content under doc 108; batch 9: novel.
    // With maintainEvery=3, ttlBatches=3: maintenance at batches 3/6/9
    // evicts rows older than 3 batches — batch 6 evicts the original
    // anchor fingerprint, so batch 8's re-delivery must RE-LAND (the
    // explicit bounded-state trade), and batch 9's cycle evicts
    // batches 3-5.
    val batches: Seq[Seq[(Long, String, String, String, Long)]] =
      Seq(Seq(doc(101, "anchor " * 20))) ++
        (2 to 7).map(i => Seq(doc(i.toLong, s"novel-$i " * 10))) ++
        Seq(Seq(doc(108, "anchor " * 20)), Seq(doc(9, "novel-9 " * 10)))
    batches.foreach { b =>
      b.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    // keepVersions = 5: the incremental cycle commits delete +
    // materialize + pack, so a 2-version window would expire the
    // eviction commit this test asserts on
    streaming.StreamingRunner.runStreamingDedupIngest(spark, srcDir, indexRoot,
      queryName = "graft_sttl", maintainEvery = 3, keepVersions = 5,
      ttlBatches = 3)
    val idx = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("doc_id"), col("text"), col("batch_seq"))
      .collect().map(r => (r.getLong(0), r.getString(1).trim.takeWhile(_ != ' '), r.getLong(2)))
      .toSet
    // survivors of the batch-9 eviction (keep batch_seq >= 6): novels
    // 6/7/9 and the RE-ADMITTED anchor — under doc 108, not 101
    assert(idx == Set(
      (6L, "novel-6", 6L), (7L, "novel-7", 7L),
      (108L, "anchor", 8L), (9L, "novel-9", 9L)),
      s"TTL horizon must keep exactly the last-3-batch fingerprints, got $idx")
    // history is honest: the row-dropping eviction is op "delete" (a
    // deletion-vector commit, cost ∝ expired rows); the row-preserving
    // pack/materialize steps are op "compact"; nothing commits the old
    // whole-table "rewrite"
    val ops = sources.SnapshotTable.history(spark, indexRoot).map(_.op)
    assert(ops.contains("delete") && !ops.contains("rewrite"),
      s"eviction must commit as a dv delete, not a whole-table rewrite: $ops")
  }

  test("partition TTL on a streamed corpus: whole-day eviction is op delete, zero data I/O") {
    import spark.implicits._
    val snap = sources.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("graft-pttl").toString
    val srcRoot = s"$tmp/src"
    val root = s"$tmp/tbl"
    // upstream: three days of corpus, committed as three versions so
    // the drain sees real micro-batches
    snap.create(spark, srcRoot,
      Seq((0L, "d1"), (1L, "d1")).toDF("id", "day").coalesce(1),
      statsKey = Some("id"))
    // one source file per day-batch → one data file per day downstream,
    // so the mixed-predicate leg below deletes a PROPER subset of a file
    snap.append(spark, srcRoot,
      Seq((2L, "d2"), (3L, "d2")).toDF("id", "day").coalesce(1))
    snap.append(spark, srcRoot, Seq((4L, "d3")).toDF("id", "day").coalesce(1))
    // target: a DAY-PARTITIONED table fed by the stream (appends honor
    // the declared layout — every epoch lands under its day directory)
    snap.create(spark, root,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        Seq((0L, "")).toDF("id", "day").schema),
      statsKey = Some("id"), partitionCols = Seq("day"))
    val q = spark.readStream.format("graft-table").option("path", srcRoot).load()
      .writeStream.queryName("graft_pttl")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        snap.append(spark, root, b); ()
      }
      .start()
    q.awaitTermination()
    assert(snap.read(spark, root).count() == 5)
    def diskFiles(): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
    }
    val before = diskFiles()
    // TTL eviction: expire day d1 — the whole-partition fast path must
    // take it as ONE pure-metadata "delete" commit
    assert(snap.deleteWhere(spark, root, col("day") === "d1").isDefined)
    assert(diskFiles() == before,
      "whole-partition eviction must write no data files and no dv sidecars")
    val det = snap.describeDetail(spark, root)
    assert(det.dvFiles == 0, "eviction must leave zero dv debt")
    assert(snap.history(spark, root).last.op == "delete")
    assert(snap.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L, 4L))
    assert(snap.partitionsDf(spark, root).select("day").as[String]
      .collect().sorted.toSeq == Seq("d2", "d3"),
      "the expired day must vanish from the partitions listing")
    // idempotent: re-expiring the same day commits nothing
    assert(snap.deleteWhere(spark, root, col("day") === "d1").isEmpty)
    // a MIXED predicate (partition + data column) declines the fast
    // path and runs the row-level dv delete — correct either way
    assert(snap.deleteWhere(spark, root,
      col("day") === "d2" && col("id") === 2L).isDefined)
    assert(snap.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      == Seq(3L, 4L))
    assert(snap.describeDetail(spark, root).dvFiles == 1,
      "the mixed predicate must have taken the dv path")
  }

  test("whole-partition delete stays CDC-honest and dv-correct") {
    import spark.implicits._
    val snap = sources.SnapshotTable
    val root = s"${java.nio.file.Files.createTempDirectory("graft-pttlcdc")}/t"
    snap.create(spark, root,
      Seq((0L, "d1"), (1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "day")
        .coalesce(1),
      statsKey = Some("id"), partitionCols = Seq("day"))
    // a ROW-LEVEL dv delete inside the doomed partition first: the
    // whole-partition drop must count only LIVE rows afterwards
    assert(snap.deleteWhere(spark, root, col("id") === 1L).isDefined)
    assert(snap.describeDetail(spark, root).dvFiles == 1)
    val vBefore = snap.versions(spark, root).last
    // the fast path drops the dv-BEARING file too (its path proves the
    // partition; the dv only hides rows)
    assert(snap.deleteWhere(spark, root, col("day") === "d1").isDefined)
    assert(snap.history(spark, root).last.op == "delete")
    assert(snap.describeDetail(spark, root).dvFiles == 0)
    assert(snap.read(spark, root).select("id").as[Long].collect().toSeq == Seq(3L))
    // CDC window over the partition drop: exactly the partition's LIVE
    // rows (0, 2 — NOT the already-deleted 1) come back as deletes
    val ch = snap.readChanges(spark, root, vBefore)
      .select(col("_change_type"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(ch == Seq(("delete", 0L), ("delete", 2L)),
      s"partition-drop CDC must emit the live rows only, got $ch")
  }

  test("dedup probe prunes: a micro-batch key probe reads fewer index files than a full scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sprobe")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // 8 batches of 8 novel docs each, maintenance every 4 → the final
    // index is CLUSTERED into compactTargetFiles disjoint fp ranges
    (0 until 8).foreach { i =>
      (0 until 8).map(j => doc(i * 8L + j, s"payload-$i-$j " * 10))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    streaming.StreamingRunner.runStreamingDedupIngest(spark, srcDir, indexRoot,
      queryName = "graft_sprobe", maintainEvery = 4, keepVersions = 2,
      compactTargetFiles = 4)
    val fullFiles = sources.SnapshotTable.read(spark, indexRoot).inputFiles.length
    assert(fullFiles >= 4, s"the maintained index must be multi-file, got $fullFiles")
    // the probe a 2-doc micro-batch would issue — THE SAME readKeysStr
    // call the ingest uses, pruning on the fp column's own binary
    // stats (no derived side-channel key). md5-derived keys make the
    // [min,max] envelope span ~everything; the point probe must not.
    val keys = Seq("payload-0-0 " * 10, "payload-7-7 " * 10)
      .toDF("text").select(md5(col("text").cast("binary")))
      .collect().map(_.getString(0))
    val probeFiles = sources.SnapshotTable
      .readKeysStr(spark, indexRoot, "fp", keys).inputFiles.length
    assert(probeFiles < fullFiles,
      s"a 2-key probe against a clustered index must read fewer files " +
        s"($probeFiles) than the full index ($fullFiles)")
    assert(probeFiles <= 2, s"2 keys land in at most 2 disjoint-range files, read $probeFiles")
  }

  test("dedup probe prunes PRE-maintenance: blooms skip fresh unclustered index files") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sbloom")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // 6 micro-batches, NO maintenance: every index file is a fresh
    // unclustered append whose md5-uniform fp range spans ~everything —
    // range stats keep all of them, so before the r9 blooms this exact
    // probe scanned the whole index on every micro-batch
    (0 until 6).foreach { i =>
      (0 until 6).map(j => doc(i * 6L + j, s"fresh-$i-$j " * 10))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    streaming.StreamingRunner.runStreamingDedupIngest(spark, srcDir, indexRoot,
      queryName = "graft_sbloom")
    val fullFiles = sources.SnapshotTable.read(spark, indexRoot).inputFiles.length
    assert(fullFiles >= 6, s"unmaintained index must be one file per batch, got $fullFiles")
    def fpOf(text: String): Array[String] = Seq(text).toDF("text")
      .select(md5(col("text").cast("binary"))).collect().map(_.getString(0))
    // the all-novel micro-batch probe shape: absent keys — only the
    // bloom stands between this and a 6-file scan
    val probeFiles = sources.SnapshotTable
      .readKeysStr(spark, indexRoot, "fp", fpOf("never-ingested " * 10))
      .inputFiles.length
    assert(probeFiles == 0,
      s"absent-fp probe must be bloom-pruned to zero of $fullFiles fresh files, read $probeFiles")
    // and a present fp still finds its row (no false negative end to end)
    val present = fpOf("fresh-0-0 " * 10)
    val hit = sources.SnapshotTable.readKeysStr(spark, indexRoot, "fp", present)
    assert(hit.filter(col("fp") === present.head).count() == 1)
    assert(hit.inputFiles.length < fullFiles,
      s"present-fp probe must prune too: read ${hit.inputFiles.length}/$fullFiles")
  }

  test("TTL survives a stream restart: the sequence resumes from the index, the horizon keeps moving") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-srestart")
    val src1 = s"$tmp/src1"
    val src2 = s"$tmp/src2"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    def drop(dir: String, d: (Long, String, String, String, Long)): Unit =
      Seq(d).toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(dir)
    // RUN 1: batches 1-3 (maintenance at 3 keeps everything: horizon 0)
    drop(src1, doc(1, "old-one " * 10))
    drop(src1, doc(2, "old-two " * 10))
    drop(src1, doc(3, "recent-three " * 10))
    streaming.StreamingRunner.runStreamingDedupIngest(spark, src1, indexRoot,
      queryName = "graft_srestart1", maintainEvery = 3, keepVersions = 2,
      ttlBatches = 3)
    // RUN 2 (the restart): a fresh stream on the same index. The seq
    // counter must SEED from max(batch_seq)=3 — a reset to zero would
    // number these 1-3 and the maintenance below would keep everything
    drop(src2, doc(4, "new-four " * 10))
    drop(src2, doc(5, "new-five " * 10))
    drop(src2, doc(6, "new-six " * 10))
    streaming.StreamingRunner.runStreamingDedupIngest(spark, src2, indexRoot,
      queryName = "graft_srestart2", maintainEvery = 3, keepVersions = 2,
      ttlBatches = 3)
    // run-2 batches are 4/5/6; maintenance at 6 keeps batch_seq >= 3
    val seqs = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("doc_id"), col("batch_seq")).as[(Long, Long)].collect().toMap
    assert(seqs.keySet == Set(3L, 4L, 5L, 6L),
      s"restart must evict batches 1-2 (past the moving horizon), got $seqs")
    assert(seqs(4L) == 4L && seqs(6L) == 6L,
      s"the restarted stream must continue the sequence, not restart it: $seqs")
  }

  test("enabling TTL on a pre-TTL index: null-stamped legacy rows are retained, not mass-evicted") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-slegacy")
    val src1 = s"$tmp/src1"
    val src2 = s"$tmp/src2"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    def drop(dir: String, ds: (Long, String, String, String, Long)*): Unit =
      ds.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1).write.mode("append").parquet(dir)
    // RUN 1: no TTL — the index has no batch_seq column
    drop(src1, doc(1, "legacy-alpha " * 10))
    drop(src1, doc(2, "legacy-beta " * 10))
    streaming.StreamingRunner.runStreamingDedupIngest(spark, src1, indexRoot,
      queryName = "graft_slegacy1")
    // RUN 2: TTL enabled. Batch 1 re-delivers legacy content (must
    // dedup — the legacy fingerprints are knowledge, not expired rows)
    // plus a novel doc; batch 2 is novel — maintenance fires at 2.
    drop(src2, doc(11, "legacy-alpha " * 10), doc(3, "new-gamma " * 10))
    drop(src2, doc(4, "new-delta " * 10))
    streaming.StreamingRunner.runStreamingDedupIngest(spark, src2, indexRoot,
      queryName = "graft_slegacy2", maintainEvery = 2, keepVersions = 2,
      ttlBatches = 2)
    val rows = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("doc_id"), col("batch_seq"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // legacy rows (null batch_seq → -1 here) survived the cycle; the
    // re-delivered legacy-alpha did NOT re-land (no doc 11); both new
    // docs landed with stamps
    assert(rows.keySet == Set(1L, 2L, 3L, 4L),
      s"legacy rows retained, re-delivery deduped, novels landed: $rows")
    assert(rows(1L) == -1L && rows(2L) == -1L,
      s"legacy rows carry no stamp and must still be here: $rows")
    assert(rows(3L) == 1L && rows(4L) == 2L, s"stamped novels: $rows")
  }

  test("event-time TTL: re-delivery within the horizon dedups, post-horizon content re-admits") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-settl")
    val srcDir = s"$tmp/src"
    val indexRoot = s"$tmp/index"
    val Hour = 3600L * 1000000
    def doc(id: Long, text: String, tsHours: Long) =
      (id, text, "en", "s", text.length.toLong, tsHours * Hour)
    def drop(ds: (Long, String, String, String, Long, Long)*): Unit =
      ds.toDF("doc_id", "text", "lang", "source", "n_chars", "ts")
        .repartition(1).write.mode("append").parquet(srcDir)
    // TTL = 5 hours of EVENT time, maintenance every 2 batches.
    // b1: anchor @ t=0h. b2: novel @ t=1h → maint: hwm 1h, horizon -4h.
    // b3: LATE re-delivery of anchor (its own ts 0h is old — the probe
    //     is by fingerprint, so it still dedups) + novel @ t=2h.
    // b4: novel @ t=8h → maint: hwm 8h, horizon 3h → anchor (0h),
    //     b2 (1h), b3's novel (2h) evicted.
    // b5: anchor re-delivered @ t=9h — its fingerprint expired, so it
    //     RE-LANDS (the bounded-state trade, in event time).
    // b6: novel @ t=10h → maint: hwm 10h, horizon 5h → survivors are
    //     the 8h/9h/10h rows.
    drop(doc(101, "anchor " * 10, 0))
    drop(doc(2, "novel-b2 " * 10, 1))
    drop(doc(109, "anchor " * 10, 0), doc(3, "novel-b3 " * 10, 2))
    drop(doc(4, "novel-b4 " * 10, 8))
    drop(doc(105, "anchor " * 10, 9))
    drop(doc(6, "novel-b6 " * 10, 10))
    // keepVersions = 6: wide enough that the b4 cycle's eviction
    // commit is still in history at the end (the incremental cycle
    // commits delete THEN pack, so a 2-version window would only ever
    // show the trailing pack)
    streaming.StreamingRunner.runStreamingDedupIngestEventTime(spark, srcDir,
      indexRoot, queryName = "graft_settl", maintainEvery = 2,
      keepVersions = 6, ttlMicros = 5 * Hour)
    val rows = sources.SnapshotTable.read(spark, indexRoot)
      .select(col("doc_id"), col("event_ts")).as[(Long, Long)].collect().toMap
    assert(rows.keySet == Set(4L, 105L, 6L),
      s"survivors must be the rows inside the final 5h event-time horizon " +
        s"(8h/9h/10h), with the anchor RE-ADMITTED under doc 105: $rows")
    assert(rows(105L) == 9 * Hour,
      "the re-admitted anchor carries its re-delivery event time")
    // and the in-horizon late re-delivery did NOT land (no doc 109)
    assert(!rows.contains(109L),
      "a late duplicate inside the horizon must dedup by fingerprint")
    val ops = sources.SnapshotTable.history(spark, indexRoot).map(_.op)
    assert(ops.contains("delete") && !ops.contains("rewrite"),
      s"event-time eviction commits as a dv delete, not a whole-table rewrite: $ops")
  }

  test("schema evolution across stream runs: a redeployed chunker adds a column mid-table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sevo")
    val src1 = s"$tmp/src1"
    val src2 = s"$tmp/src2"
    val indexRoot = s"$tmp/index"
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    // RUN 1: stock chunker (doc_id, chunk_idx, chunk) over two
    // micro-batches — the composition under test is the foreachBatch
    // upsert × per-version manifest schemas, so the stream must commit
    // several pre-evolution versions first
    Seq(doc(1, "alpha " * 40)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(src1)
    Seq(doc(2, "beta " * 40)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(src1)
    streaming.StreamingRunner.runStreamingIndexUpsert(spark, src1, indexRoot,
      queryName = "graft_sevo1")
    val preEvo = sources.SnapshotTable.versions(spark, indexRoot)
    assert(preEvo.size == 2)
    // RUN 2: the stream redeploys with a chunker that EMITS A NEW
    // COLUMN (per-chunk length tag), re-processing doc 2 and adding
    // doc 3 — two more micro-batches, each an evolving atomic merge
    Seq(doc(2, "beta " * 40)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(src2)
    Seq(doc(3, "gamma " * 40)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(src2)
    streaming.StreamingRunner.runStreamingIndexUpsert(spark, src2, indexRoot,
      queryName = "graft_sevo2",
      chunker = b => chunk.Chunking.chunkTable(b)
        .select(col("doc_id"), col("chunk_idx"), col("chunk"),
          length(col("chunk")).cast("long").as("q")))
    // every PRE-evolution version still reads with its own schema
    preEvo.foreach { v =>
      assert(sources.SnapshotTable.read(spark, indexRoot, Some(v)).columns.toSeq ==
        Seq("doc_id", "chunk_idx", "chunk"),
        s"version $v predates the evolution and must never show the new column")
    }
    // the final read applies the evolved schema: doc 1's files predate
    // the evolution and null-fill q; docs 2 and 3 carry real values
    val latest = sources.SnapshotTable.read(spark, indexRoot)
    assert(latest.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk", "q"))
    assert(latest.filter(col("doc_id") === 1L).count() > 0)
    assert(latest.filter(col("doc_id") === 1L && col("q").isNotNull).count() == 0,
      "pre-evolution files must null-fill the evolved column")
    val evolved = latest.filter(col("doc_id") >= 2L)
      .select(col("q"), length(col("chunk")).cast("long")).collect()
    assert(evolved.nonEmpty)
    evolved.foreach(r => assert(!r.isNullAt(0) && r.getLong(0) == r.getLong(1),
      "re-processed and new docs must carry the chunker's real values"))
  }
}
