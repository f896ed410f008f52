package graft.catalog

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.sources.SnapshotTable

/** INSERT INTO / INSERT OVERWRITE / CTAS-append for the snapshot
  * table, as a [[V1Write]]: the engine hands the fully-planned batch
  * frame to [[InsertableRelation.insert]], and the table's own commit
  * machinery does what it always does — footer-measured stats, CHECK
  * constraints riding the write, column-map translation, schema
  * alignment, optimistic retry. One write path, two front doors.
  * Overwrite commits op "rewrite" (whole-snapshot replace — CDC and
  * the streaming source see it honestly); append commits "append". */
private[catalog] final class GraftWriteBuilder(spark: SparkSession, root: String)
  extends WriteBuilder with SupportsTruncate with SupportsOverwrite
    with SupportsDynamicOverwrite {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  /** The table has no partition columns, so "overwrite the partitions
    * present in the data" (a session running
    * `partitionOverwriteMode=dynamic`) degenerates to the one
    * partition there is: the whole table. */
  override def overwriteDynamicPartitions(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]),
      "graft tables support INSERT OVERWRITE of the whole table only " +
        "(partition-scoped overwrite has no partition directories to scope to); " +
        "use MERGE INTO or DELETE + INSERT for a predicate-scoped rewrite")
    overwriteAll = true
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          if (overwriteAll || overwrite) SnapshotTable.sqlOverwrite(spark, root, data)
          else SnapshotTable.append(spark, root, data)
          ()
        }
      }
    // dynamic overwrite has no V1 exec in Spark: it plans through
    // OverwritePartitionsDynamicExec, which drives a real BatchWrite —
    // executor parquet writers + a whole-snapshot "rewrite" commit
    override def toBatch: BatchWrite = {
      val snap = SnapshotTable.sqlSnapshot(spark, root)
      new GraftFileBatchWrite(spark, snap, snap.schema, { files =>
        SnapshotTable.sqlValidateWritten(spark, snap.root, files.map(_.relPath))
        SnapshotTable.sqlOverwriteFiles(spark, snap.root, files)
        ()
      })
    }

    /** `writeStream.toTable(name)` — each epoch is one atomic commit
      * carrying the epoch id as the manifest's `txnBatchId`: the same
      * replay cursor as the V1 streaming sink, so a crash between the
      * table commit and the checkpoint commit replays into a
      * recognized-and-dropped epoch. Append/Update output modes APPEND
      * the epoch's rows; Complete output mode (the engine called
      * [[SupportsTruncate.truncate]] on this builder) REPLACES the
      * whole snapshot each epoch — every epoch carries the full result
      * by Spark's contract, so re-appending it would silently
      * duplicate rows. Executor parquet writers measure the stats-key
      * ranges in the write loop; CHECK constraints validate over just
      * the epoch's files before anything publishes. Contract: one
      * streaming query (one checkpoint) writes a table. */
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
        private val snap = SnapshotTable.sqlSnapshot(spark, root)
        private val batch = new GraftFileBatchWrite(spark, snap, snap.schema,
          _ => throw new IllegalStateException("streaming commits go through commit(epoch, ...)"))

        override def createStreamingWriterFactory(
            info: PhysicalWriteInfo)
            : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
          batch.createBatchWriterFactory(info)
            .asInstanceOf[GraftWriterFactory]

        override def commit(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = {
          val files = messages.collect {
            case m: GraftCommitMessage if m.rows > 0 => m
          }.sortBy(_.relPath).toIndexedSeq
          // replay (crash between table commit and checkpoint commit):
          // recognized by the cursor, dropped; this attempt's files are
          // unreferenced and die in the next vacuum
          if (SnapshotTable.lastTxnBatchId(spark, root).exists(_ >= epochId)) {
            files.foreach { m =>
              val p = new Path(root, m.relPath)
              try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .delete(p, false)
              catch { case _: Exception => () }
            }
            return
          }
          if (files.nonEmpty)
            SnapshotTable.sqlValidateWritten(spark, root, files.map(_.relPath))
          val written = files.map(m => SnapshotTable.SqlWrittenFile(m.relPath,
            m.rows, m.bytes, m.minL, m.maxL, m.minB, m.maxB, m.min2L, m.max2L,
            m.min2B, m.max2B))
          if (overwriteAll) {
            // Complete output mode: this epoch IS the full result —
            // replace the snapshot (op "rewrite"; an empty result
            // honestly empties the table). Appending here would
            // re-deliver every prior epoch's rows.
            SnapshotTable.sqlOverwriteFiles(spark, root, written,
              txnBatchId = Some(epochId))
            ()
          } else if (files.nonEmpty) {
            SnapshotTable.sqlAppendFiles(spark, root, written,
              txnBatchId = epochId)
            ()
          }
        }

        override def abort(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit =
          messages.collect { case m: GraftCommitMessage if m.relPath != null =>
            val p = new Path(root, m.relPath)
            try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, false)
            catch { case _: Exception => () }
          }
      }
  }
}

/** One written data file, as the executor reported it: path, row
  * count, byte size, and the min/max it measured over the table's
  * stats key(s) while writing — a manifest entry's worth of facts with
  * zero post-write footer reads. */
private[graft] final case class GraftCommitMessage(relPath: String,
    rows: Long, bytes: Long,
    minL: Option[Long], maxL: Option[Long],
    minB: Option[Array[Byte]], maxB: Option[Array[Byte]],
    min2L: Option[Long], max2L: Option[Long],
    min2B: Option[Array[Byte]], max2B: Option[Array[Byte]])
  extends WriterCommitMessage

private[graft] object GraftCommitMessage {
  /** Per-file facts from a mixed message array: plain writers report
    * one file each, bucketed writers report one message carrying
    * several files. */
  def flatten(messages: Iterable[WriterCommitMessage]): Seq[GraftCommitMessage] =
    messages.toSeq.flatMap {
      case m: GraftCommitMessage => Seq(m)
      case GraftMultiCommitMessage(ms) => ms
      case _ => Seq.empty
    }
}

/** A bucketed task's commit message: one fact row per file it wrote
  * (a task usually writes exactly one bucket's file — the write's
  * required distribution clusters by the bucket key — but correctness
  * never assumes it). */
private[graft] final case class GraftMultiCommitMessage(
    files: Seq[GraftCommitMessage]) extends WriterCommitMessage

/** Which write-schema ordinal feeds which stats slot, and how. */
private[graft] final case class StatsSpec(ordinal: Int, isString: Boolean,
    secondary: Boolean)

/** The row-level (group-based copy-on-write) write: MERGE INTO /
  * UPDATE / non-filter DELETE land here. Executor tasks write parquet
  * files (Spark's own [[ParquetWriteSupport]] under parquet-hadoop's
  * writer — the same bytes `df.write.parquet` produces) and report
  * per-file stats in their commit messages; the driver-side commit
  * validates CHECK constraints over the written files and publishes
  * ONE manifest version replacing exactly the files the operation's
  * scan read ([[SnapshotTable.sqlReplaceFiles]] — carried files, dv
  * references included, ride verbatim). A concurrent commit between
  * scan and write REFUSES loudly; the task-commit coordinator
  * deduplicates speculative attempts before any file reaches the
  * manifest. */
private[catalog] final class GraftReplaceWrite(spark: SparkSession,
    snap: SnapshotTable.SqlSnapshot, scanned: () => Set[String],
    writeSchema: StructType) extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** DECLARED-bucket tables keep their storage-partitioned layout
    * THROUGH row-level rewrites: the replacement files are written
    * bucket-per-file at the declared count (same path shape as
    * [[SnapshotTable.compactBucketed]]), so a steady-state MERGE/CDC
    * workload never pays the one remaining O(table) maintenance op a
    * dissolved layout used to demand. Armed only when the declared
    * count, a hashable stats key in the write schema, and a clean
    * `_graft_bucket` name all line up — otherwise the plain write
    * runs and dissolution stays the conservative safety net. */
  private val bucketSpec: Option[(Int, String, Int, DataType)] =
    for {
      n <- snap.declaredBuckets
      key <- snap.statsKey
      (f, i) <- writeSchema.fields.zipWithIndex
        .find(_._1.name.equalsIgnoreCase(key))
      if (f.dataType == IntegerType || f.dataType == LongType ||
        f.dataType == StringType) &&
        !writeSchema.fields.exists(_.name.equalsIgnoreCase("_graft_bucket"))
    } yield (n, f.name, i, f.dataType)

  // cluster the replacement rows by the bucket key into exactly
  // `buckets` partitions: Spark's hash partitioning IS the bucket
  // function (pmod(murmur3(key, seed 42), n)), so each writer task
  // receives one bucket and opens one file. The writer still derives
  // each row's bucket itself — the distribution only bounds file
  // count, never correctness.
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    bucketSpec match {
      case Some((_, keyName, _, _)) =>
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .column(keyName)))
      case None =>
        org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    }

  override def requiredNumPartitions(): Int =
    bucketSpec.map(_._1).getOrElse(0)

  // sort by key within each bucket file: row-group stats stay selective
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    bucketSpec match {
      case Some((_, keyName, _, _)) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(keyName),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      case None => Array.empty
    }

  override def toBatch: BatchWrite =
    new GraftFileBatchWrite(spark, snap, writeSchema, { files =>
      // CHECK constraints: the rows were written by executor tasks, so
      // validation is one explicit job over just the new files —
      // a violation aborts with nothing published
      SnapshotTable.sqlValidateWritten(spark, snap.root, files.map(_.relPath))
      SnapshotTable.sqlReplaceFiles(spark, snap.root, snap.version, scanned(), files)
      ()
    }, bucketSpec.map { case (n, _, i, dt) => (n, i, dt) })
}

/** The shared file-producing half of every DSv2 batch write: executor
  * tasks stream rows into parquet ([[GraftParquetWriter]]) and report
  * per-file facts; `commitFiles` decides what manifest commit those
  * files become (replace-scanned for row-level operations, whole
  * snapshot for dynamic overwrite). */
private[catalog] final class GraftFileBatchWrite(spark: SparkSession,
    snap: SnapshotTable.SqlSnapshot, writeSchema: StructType,
    commitFiles: Seq[SnapshotTable.SqlWrittenFile] => Unit,
    bucketed: Option[(Int, Int, DataType)] = None) extends BatchWrite {

  // a bucketed replace write spells its bucket count in the batch path
  // ([[SnapshotTable]]'s BucketPathRe), so the layout claim survives
  // the rewrite with no manifest format change
  private val batchDir = bucketed match {
    case Some((n, _, _)) =>
      s"data/bkt$n-${java.util.UUID.randomUUID().toString.take(8).filter(_ != '-')}"
    case None => s"data/sql-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // files spell physical names (at every struct level); the batch
    // arrives logical
    val physWrite = snap.physSchemaFor(writeSchema)
    def spec(key: Option[String], secondary: Boolean): Option[StatsSpec] =
      key.flatMap { k =>
        writeSchema.fields.zipWithIndex.collectFirst {
          case (f, i) if f.name.equalsIgnoreCase(k) => (f.dataType, i)
        }.collect {
          case (LongType | IntegerType, i) => StatsSpec(i, isString = false, secondary)
          case (StringType, i) => StatsSpec(i, isString = true, secondary)
        }
      }
    GraftWriterFactory(
      new SerializableHadoopConf(GraftParquetWriter.confWithSessionKeys(
        spark.sparkContext.hadoopConfiguration)),
      snap.root, batchDir, physWrite,
      Seq(spec(snap.statsKey, secondary = false),
        spec(snap.statsKey2, secondary = true)).flatten,
      bucketed)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = GraftCommitMessage.flatten(messages)
      .filter(_.rows > 0).sortBy(_.relPath).toIndexedSeq
    commitFiles(files.map(m => SnapshotTable.SqlWrittenFile(m.relPath, m.rows,
      m.bytes, m.minL, m.maxL, m.minB, m.maxB, m.min2L, m.max2L, m.min2B, m.max2B)))
    // zero-row attempts may have left nothing; empty dirs are inert
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(snap.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try f.delete(new Path(snap.root, batchDir), true)
    catch { case _: Exception => () }
    ()
  }
}

/** Serializable Hadoop conf (the stock helper is private[spark]):
  * ships the driver's configuration to writer tasks via Hadoop's own
  * Writable form. */
private[graft] final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[catalog] final case class GraftWriterFactory(conf: SerializableHadoopConf,
    root: String, batchDir: String, physSchema: StructType, stats: Seq[StatsSpec],
    bucketed: Option[(Int, Int, DataType)] = None)
  extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    bucketed match {
      case Some((n, keyOrdinal, keyType)) =>
        new GraftBucketedDataWriter(conf.value, root, batchDir, physSchema,
          stats, n, keyOrdinal, keyType, partitionId, taskId)
      case None =>
        new GraftParquetWriter(conf.value, root,
          s"$batchDir/part-$partitionId-$taskId.parquet", physSchema, stats)
    }
  // streaming twin: the task id is globally unique per attempt, so the
  // same naming scheme keeps every epoch's files distinct
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftParquetWriter(conf.value, root,
      s"$batchDir/part-$partitionId-$taskId-e$epochId.parquet", physSchema, stats)
}

/** A row-level write task on a DECLARED-bucket table: routes each row
  * to its bucket's file (`pmod(murmur3_hash(key), n)` — the writer's
  * exact typed hash, [[GraftBucketFunction]]'s twin) under the
  * bucketed path shape, measuring stats in the write loop like the
  * plain writer. The write's required distribution clusters rows by
  * the key into `n` partitions, so a task normally holds ONE bucket;
  * if the engine hands it more anyway, open writers are capped — the
  * overflow closes them all and reappearing buckets start new files
  * (multiple files per bucket id are a legal layout). */
private[catalog] final class GraftBucketedDataWriter(conf: Configuration,
    root: String, batchDir: String, physSchema: StructType,
    stats: Seq[StatsSpec], buckets: Int, keyOrdinal: Int, keyType: DataType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  /** Each open parquet writer buffers up to a row group; 16 bounds a
    * pathological distribution at well under executor memory. */
  private val MaxOpenWriters = 16

  private val open = new java.util.HashMap[Int, GraftParquetWriter]()
  private val done = scala.collection.mutable.ArrayBuffer.empty[GraftCommitMessage]
  private var fileSeq = 0

  // rows arrive either exactly as the write schema or with one
  // operation-marker int prefixed (same contract as GraftParquetWriter)
  private var fieldOffset = -1
  private var trim: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _

  @transient private lazy val hasher =
    org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
      Seq(org.apache.spark.sql.catalyst.expressions.BoundReference(
        keyOrdinal, keyType, nullable = true)), 42)

  override def write(row0: InternalRow): Unit = {
    if (fieldOffset < 0) {
      fieldOffset = row0.numFields - physSchema.length
      require(fieldOffset == 0 || fieldOffset == 1,
        s"bucketed writer expected ${physSchema.length} (or +1 marker) fields, " +
          s"got ${row0.numFields}")
      if (fieldOffset == 1)
        trim = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          physSchema.fields.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i + 1, f.dataType, nullable = true) }.toIndexedSeq)
    }
    val row = if (fieldOffset == 0) row0 else trim(row0)
    val h = hasher.eval(row).asInstanceOf[Int]
    val b = ((h % buckets) + buckets) % buckets
    var w = open.get(b)
    if (w == null) {
      if (open.size >= MaxOpenWriters) {
        open.values.forEach(ww =>
          done += ww.commit().asInstanceOf[GraftCommitMessage])
        open.clear()
      }
      w = new GraftParquetWriter(conf, root,
        s"$batchDir/_graft_bucket=$b/part-$partitionId-$taskId-$fileSeq.parquet",
        physSchema, stats)
      fileSeq += 1
      open.put(b, w)
    }
    w.write(row)
  }

  override def commit(): WriterCommitMessage = {
    open.values.forEach(w => done += w.commit().asInstanceOf[GraftCommitMessage])
    open.clear()
    GraftMultiCommitMessage(done.filter(_.rows > 0).toSeq)
  }

  override def abort(): Unit = {
    open.values.forEach(w => try w.abort() catch { case _: Exception => () })
    open.clear()
    // files already rolled out of the open set die with the batch dir
    // (the BatchWrite-level abort removes it)
    val f = new Path(root).getFileSystem(conf)
    done.foreach(m =>
      try f.delete(new Path(root, m.relPath), false)
      catch { case _: IOException => () })
  }

  override def close(): Unit = ()
}

/** One task's parquet writer: rows stream straight into Spark's
  * [[ParquetWriteSupport]] (no Row conversion, no buffering), stats
  * accumulate in the loop (min/max per configured key — long widened
  * from int, strings as UTF-8 bytes in unsigned order, exactly the
  * manifest's stats semantics). A task that saw no rows writes no file
  * at all. Speculative duplicates are excluded by Spark's commit
  * coordinator; the losers' files die in [[DataWriter.abort]]. */
private[graft] final class GraftParquetWriter(conf: Configuration, root: String,
    relPath: String, physSchema: StructType, stats: Seq[StatsSpec])
  extends DataWriter[InternalRow] {

  import org.apache.hadoop.mapreduce.RecordWriter

  private var writer: RecordWriter[Void, InternalRow] = _
  private var rows = 0L
  private var minL, maxL, min2L, max2L = null: java.lang.Long
  private var minB, maxB, min2B, max2B = null: Array[Byte]
  private val ord = java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte])

  private def open(): RecordWriter[Void, InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(physSchema, c)
    c.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS, classOf[ParquetWriteSupport].getName)
    new ParquetOutputFormat[InternalRow]().getRecordWriter(
      c, new Path(root, relPath), CompressionCodecName.SNAPPY)
  }

  /** Rows arrive either exactly as the write schema, or (group-based
    * ReplaceData with no metadata projection — Spark hands the raw
    * MergeRows output) prefixed with one int operation-marker column.
    * Detected once from the first row's arity; the marker is projected
    * away before parquet sees the row. */
  private var fieldOffset = -1
  private var trim: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _

  override def write(row0: InternalRow): Unit = {
    if (fieldOffset < 0) {
      fieldOffset = row0.numFields - physSchema.length
      require(fieldOffset == 0 || fieldOffset == 1,
        s"writer expected ${physSchema.length} (or +1 marker) fields, " +
          s"got ${row0.numFields}")
      if (fieldOffset == 1)
        trim = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          physSchema.fields.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i + 1, f.dataType, nullable = true) }.toIndexedSeq)
    }
    val row = if (fieldOffset == 0) row0 else trim(row0)
    if (writer == null) writer = open()
    stats.foreach { s =>
      if (!row.isNullAt(s.ordinal)) {
        if (s.isString) {
          val v = row.getUTF8String(s.ordinal).getBytes.clone()
          if (s.secondary) {
            if (min2B == null || ord(v, min2B) < 0) min2B = v
            if (max2B == null || ord(v, max2B) > 0) max2B = v
          } else {
            if (minB == null || ord(v, minB) < 0) minB = v
            if (maxB == null || ord(v, maxB) > 0) maxB = v
          }
        } else {
          val v = physSchema.fields(s.ordinal).dataType match {
            case IntegerType => row.getInt(s.ordinal).toLong
            case _ => row.getLong(s.ordinal)
          }
          if (s.secondary) {
            if (min2L == null || v < min2L) min2L = v
            if (max2L == null || v > max2L) max2L = v
          } else {
            if (minL == null || v < minL) minL = v
            if (maxL == null || v > maxL) maxL = v
          }
        }
      }
    }
    rows += 1
    writer.write(null, row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null)
      return GraftCommitMessage(relPath, 0L, 0L, None, None, None, None,
        None, None, None, None)
    writer.close(null)
    val p = new Path(root, relPath)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    GraftCommitMessage(relPath, rows, len,
      Option(minL).map(_.longValue), Option(maxL).map(_.longValue),
      Option(minB), Option(maxB),
      Option(min2L).map(_.longValue), Option(max2L).map(_.longValue),
      Option(min2B), Option(max2B))
  }

  override def abort(): Unit = {
    if (writer != null) try writer.close(null) catch { case _: Exception => () }
    val p = new Path(root, relPath)
    try p.getFileSystem(conf).delete(p, false)
    catch { case _: IOException => () }
  }

  override def close(): Unit = ()
}

private[graft] object GraftParquetWriter {
  /** [[ParquetWriteSupport]] and its schema converter ASSERT a set of
    * session keys are present in the hadoop conf (the V1 write path
    * plants them in `prepareWrite`); bake the DRIVER session's values
    * in before the conf ships to writer tasks. */
  def confWithSessionKeys(base: Configuration): Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val c = new Configuration(base)
    val sql = SQLConf.get
    Seq(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG
    ).foreach { e =>
      if (c.get(e.key) == null)
        c.set(e.key, sql.getConfString(e.key, e.defaultValueString))
    }
    c
  }
}
