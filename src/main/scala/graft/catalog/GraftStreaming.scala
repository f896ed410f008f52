package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.paths.SparkPath

import graft.sources.SnapshotTable

/** A streaming offset IS a committed table version. */
private[catalog] final case class GraftOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

/** The snapshot table as a NAME-ADDRESSED Structured Streaming source:
  * `spark.readStream.table("graft.ns.tbl")` — the DSv2 twin of the
  * path-addressed V1 `graft-table` source, with the capabilities the
  * V1 interface cannot express:
  *
  *  - real `Trigger.AvailableNow` ([[SupportsTriggerAvailableNow]]):
  *    the target version is pinned at prepare time and drained in
  *    PACED batches, where the V1 source fell back to one giant batch;
  *  - admission control: `maxVersionsPerTrigger` bounds each batch
  *    through the engine's own read-limit path.
  *
  * Semantics are the V1 source's append-only contract verbatim:
  * offsets are version numbers, a batch is the files versions
  * `(start, end]` ADDED (driver-side manifest metadata — no listing,
  * no data I/O at planning), `append`/`create` emit, layout and
  * metadata-only DDL commits deliver nothing, and any data-CHANGING
  * commit fails loudly unless `ignoreChanges` opts into skipping it
  * (row-level truth lives in [[SnapshotTable.readChanges]]). Manifests
  * and data files are immutable, so `planInputPartitions` is
  * deterministic under replay — exactly-once into any idempotent
  * sink. Retention must outlive the checkpoint lag, same contract as
  * every incremental consumer. The schema (and the column map pairing
  * it) locks at stream start from the table HEAD — restart the stream
  * to pick up new columns. */
private[catalog] final class GraftMicroBatchStream(spark: SparkSession,
    snap: SnapshotTable.SqlSnapshot, physRequired: StructType,
    options: CaseInsensitiveStringMap) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private val root = snap.root
  private val ignoreChanges = options.getBoolean("ignoreChanges", false)
  private val maxVersions = options.getInt("maxVersionsPerTrigger", 0)
  /** Byte-based admission: cap each batch at roughly this many bytes
    * of ADDED data files (manifest-recorded sizes — exact, zero I/O).
    * Versions are a weak proxy when append sizes vary by 100×; bytes
    * are what executor memory and batch latency actually scale with.
    * Soft cap, Delta-style: the first version past the start always
    * admits (else a single oversized append would stall the stream). */
  private val maxBytes = options.getLong("maxBytesPerTrigger", 0L)
  private def latestVersion: Int =
    SnapshotTable.versions(spark, root).lastOption.getOrElse(0)
  private val startingVersion: Int = Option(options.get("startingVersion")) match {
    case Some("latest") => latestVersion
    case Some(v) => v.toInt
    case None => 0
  }
  /** AvailableNow boundary, pinned when the engine prepares the run. */
  @volatile private var availableNowTarget: Option[Int] = None

  override def initialOffset(): Offset = GraftOffset(startingVersion)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].v
    var latest = latestVersion
    availableNowTarget.foreach(t => latest = math.min(latest, t))
    if (maxVersions > 0) latest = math.min(latest, from + maxVersions)
    if (maxBytes > 0 && latest > from) {
      // greedy prefix under the byte budget; composes with the
      // version cap above (both bounds hold)
      var admitted = from
      var acc = 0L
      var stop = false
      SnapshotTable.addedBytesByVersion(spark, root, from, latest).foreach {
        case (v, b) =>
          if (!stop) {
            if (admitted == from || acc + b <= maxBytes) { admitted = v; acc += b }
            else stop = true
          }
      }
      latest = admitted
    }
    GraftOffset(math.max(latest, from))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: the engine calls latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = GraftOffset(latestVersion)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].v
    val to = end.asInstanceOf[GraftOffset].v
    if (to <= from) return Array.empty
    val files = SnapshotTable.addedFiles(spark, root, from, to).flatMap {
      case (_, "append" | "create", added) => added
      // row-preserving commits deliver nothing: layout ("compact") and
      // metadata-only DDL — entries carried verbatim
      case (_, "compact" | "rename" | "drop" | "addcol" | "widen" | "constraint", _) => Seq.empty
      case _ if ignoreChanges => Nil
      case (v, op, _) =>
        throw new IllegalStateException(
          s"version $v of $root is a data-changing '$op' commit; its files mix " +
            "new and carried rows, so streaming them would re-deliver old rows. " +
            "Set .option(\"ignoreChanges\", true) to skip such commits, or " +
            "consume row-level changes in batch via SnapshotTable.readChanges.")
    }
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    files.zipWithIndex.map { case (p, i) =>
      val len = fs.getFileStatus(new Path(p)).getLen
      FilePartition(i, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(p), 0L, len, Array.empty, 0L, len, Map.empty)))
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // a stock parquet reader factory over the locked PHYSICAL schema;
    // partitions are planned per batch above (the factory is
    // partition-agnostic). Appended files never carry deletion
    // vectors, so no position filtering applies here.
    new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
      spark,
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration),
      new StaticFileIndex(spark, new Path(root), Seq.empty),
      snap.physSchema, physRequired, new StructType(), Array.empty,
      CaseInsensitiveStringMap.empty(), None, Seq.empty, Seq.empty,
      Array.empty).toBatch.createReaderFactory()

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def toString: String =
    s"GraftMicroBatchStream($root, maxVersionsPerTrigger=$maxVersions)"
}
