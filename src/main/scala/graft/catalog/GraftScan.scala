package graft.catalog

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionSpec, PartitionedFile, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.paths.SparkPath

import graft.sources.SnapshotTable

/** The snapshot table's DSv2 scan: manifest-pruned file planning in
  * front of Spark's own vectorized parquet batch machinery.
  *
  * Architecture (Iceberg's shape, this table's manifest):
  *  - `pushFilters` receives the query's V1 filters; every one is
  *    returned as residual (Spark keeps the row-level Filter — file
  *    stats only bound which FILES are scanned, the same conservative
  *    contract as every other read path here);
  *  - `build()` converts the pushed filters to catalyst conjuncts over
  *    physical names and asks the manifest which files survive
  *    ([[SnapshotTable.SqlSnapshot.keptFiles]] — the one shared pruning
  *    decision: verified stats, point-set blooms, absent stats keep);
  *  - kept files plan through a stock
  *    [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]]
  *    over a pre-pruned static index — splitting, vectorization,
  *    row-group skipping and codegen are all Spark's own;
  *  - column mapping costs a NAME, not a copy: files are read under
  *    their physical schema, and [[GraftScan.readSchema]] reports the
  *    logical twin — rows are positional, so no projection exists at
  *    runtime at all;
  *  - files carrying a deletion vector plan as their own (whole-file)
  *    partitions read row-based with parquet's generated row-index
  *    column; a per-file sorted position set (broadcast) filters
  *    deleted ordinals at the READER — the DSv2 form of merge-on-read,
  *    position-filter-at-the-reader like Delta's DV readers, zero cost
  *    when the table carries no dv debt.
  *
  * `groupScan = true` is the row-level-operation mode (MERGE/UPDATE
  * copy-on-write): filters still prune FILES (file = replacement
  * group), but are never pushed into parquet — a group-based rewrite
  * must see every row of every kept file, carried rows included. */
private[catalog] final class GraftScanBuilder(spark: SparkSession,
    snap: SnapshotTable.SqlSnapshot, groupScan: Boolean,
    onPlan: (Int, Set[String]) => Unit = (_, _) => ())
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = snap.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // match by top-level name against the logical schema (nested
    // pruning stays parquet's job via the physical read schema)
    required = StructType(requiredSchema.fields.flatMap(f =>
      FilterBridge.fieldOf(snap.schema, f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // ALL residual: the engine re-evaluates rows; stats only skip files
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val fieldType = (n: String) => FilterBridge.fieldOf(snap.schema, n).map(_.dataType)
    val bounds = pushed.flatMap(
      FilterBridge.toCatalystBound(_, fieldType, snap.physName)).toSeq
    val kept = snap.keptFiles(bounds)
    onPlan(snap.version, kept.map(_.relPath).toSet)
    // physical-named V1 filters for parquet row-group skipping — plain
    // files only, and never in group-scan mode (a group rewrite must
    // keep carried rows; a dv read derives positions from the parquet
    // row index, but row-group skips are skipped conservatively too)
    val parquetFilters =
      if (groupScan) Array.empty[Filter]
      else pushed.flatMap(FilterBridge.rename(_, snap.physName))
    new GraftScan(spark, snap, required, kept, parquetFilters)
  }
}

/** See [[GraftScanBuilder]]. One instance = one planned version of one
  * table, with its kept-file list fixed at build time (the manifest is
  * immutable; the plan is exact). */
private[graft] final class GraftScan(spark: SparkSession,
    snap: SnapshotTable.SqlSnapshot, required: StructType,
    kept: Seq[SnapshotTable.SqlDataFile], parquetFilters: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {

  /** Exposed for the pruning spec: how many files this scan planned. */
  def keptFileCount: Int = kept.size
  def keptRelPaths: Seq[String] = kept.map(_.relPath)

  private val physRequired = StructType(required.fields.map(f =>
    f.copy(name = snap.physName(f.name))))
  private val (dvFiles, plainFiles) = kept.partition(_.hasDv)

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftScan ${snap.root} v${snap.version} files=${kept.size} (dv=${dvFiles.size})"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, kept.map(_.bytes).sum))
    override def numRows(): java.util.OptionalLong = {
      val rs = kept.map(_.rows)
      if (rs.nonEmpty && rs.forall(_.isDefined) && dvFiles.isEmpty)
        java.util.OptionalLong.of(rs.flatten.sum)
      else java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = this

  private def status(f: SnapshotTable.SqlDataFile): FileStatus =
    new FileStatus(f.bytes, false, 1, math.max(f.bytes, 1L), 0L,
      new Path(snap.root, f.relPath))

  private def parquetScanOver(files: Seq[SnapshotTable.SqlDataFile],
      readSchema: StructType, filters: Array[Filter]): ParquetScan =
    new ParquetScan(spark, spark.sparkContext.hadoopConfiguration,
      new StaticFileIndex(spark, new Path(snap.root), files.map(status)),
      snap.physSchema, readSchema, new StructType(), filters,
      CaseInsensitiveStringMap.empty(), None, Seq.empty, Seq.empty,
      Array.empty)

  private lazy val plainBatch: Option[Batch] =
    if (plainFiles.isEmpty) None
    else Some(parquetScanOver(plainFiles, physRequired, parquetFilters).toBatch)

  /** dv files read with parquet's generated row-index column appended
    * (correct ordinals under splits and row-group structure alike) and
    * NO pushed filters — the reader-level position filter must see the
    * true ordinal stream, and the residual Filter above re-applies
    * predicates anyway. */
  private lazy val dvBatch: Option[Batch] =
    if (dvFiles.isEmpty) None
    else Some(parquetScanOver(dvFiles,
      // nullable: the column is absent from the file by construction —
      // the reader null-fills it as "missing", then its row-index
      // generator overwrites the vector with true ordinals
      StructType(physRequired.fields :+ StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType, nullable = true)),
      Array.empty).toBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    val plain = plainBatch.map(_.planInputPartitions()).getOrElse(Array.empty[InputPartition])
    // one whole-file partition per dv file: the position set is
    // per-file, so the reader must know which file it is draining
    val dv = dvFiles.zipWithIndex.map { case (f, i) =>
      val pf = PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(new Path(snap.root, f.relPath).toString),
        0L, f.bytes, Array.empty, 0L, f.bytes, Map.empty)
      GraftDvPartition(FilePartition(plain.length + i, Array(pf)), f.relPath)
        : InputPartition
    }.toArray
    plain ++ dv
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val dvPos: Option[Broadcast[Map[String, Array[Long]]]] =
      if (dvFiles.isEmpty) None
      else Some(spark.sparkContext.broadcast(
        snap.dvPositionMap(dvFiles.map(_.relPath))))
    GraftReaderFactory(
      plainBatch.map(_.createReaderFactory()),
      dvBatch.map(_.createReaderFactory()),
      dvPos, physRequired.fields.map(_.dataType),
      // BatchScanExec refuses mixed row/columnar partitions: any dv
      // file in the plan forces the whole scan row-based (dv debt is
      // transitional — maintenance rewrites restore the columnar path)
      forceRow = dvFiles.nonEmpty)
  }
}

/** A dv-carrying file's scan unit: the stock [[FilePartition]] the
  * parquet reader consumes plus the manifest-relative path whose
  * deleted-position set applies. */
private[graft] final case class GraftDvPartition(inner: FilePartition,
    relPath: String) extends InputPartition

/** Routes plain partitions to the stock parquet reader factory
  * (columnar included) and dv partitions to a row-based reader wrapped
  * with the position filter. */
private[catalog] final case class GraftReaderFactory(
    plain: Option[PartitionReaderFactory], dv: Option[PartitionReaderFactory],
    dvPos: Option[Broadcast[Map[String, Array[Long]]]],
    dataTypes: Array[org.apache.spark.sql.types.DataType],
    forceRow: Boolean) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    !forceRow && (partition match {
      case _: GraftDvPartition => false
      case other => plain.exists(_.supportColumnarReads(other))
    })

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GraftDvPartition(inner, rel) =>
        val deleted = dvPos.map(_.value.getOrElse(rel, Array.emptyLongArray))
          .getOrElse(Array.emptyLongArray)
        new DvFilteringReader(dv.get.createReader(inner), deleted, dataTypes)
      case other => plain.get.createReader(other)
    }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    plain.get.createColumnarReader(partition) // only reachable for plain parts
}

/** Drops rows whose parquet row ordinal (the generated row-index
  * column, LAST in the delegate's schema) appears in `deleted`
  * (sorted), and trims the ordinal off — emitting exactly the file's
  * live rows under the scan's declared schema. Rows are copied through
  * an [[UnsafeProjection]] (the delegate reuses its row object). */
private[catalog] final class DvFilteringReader(
    delegate: PartitionReader[InternalRow], deleted: Array[Long],
    dataTypes: Array[org.apache.spark.sql.types.DataType])
  extends PartitionReader[InternalRow] {

  private val idxOrdinal = dataTypes.length
  private lazy val proj = UnsafeProjection.create(
    dataTypes.zipWithIndex.map { case (dt, i) =>
      BoundReference(i, dt, nullable = true) }.toIndexedSeq)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (delegate.next()) {
      val r = delegate.get()
      if (java.util.Arrays.binarySearch(deleted, r.getLong(idxOrdinal)) < 0) {
        current = proj(r).copy()
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = delegate.close()
}

/** A [[PartitioningAwareFileIndex]] over a FIXED file list — the
  * manifest already decided what to scan (sizes included: zero
  * filesystem calls), so the index just carries statuses into Spark's
  * split planning. Unpartitioned by construction (the table's layout
  * lives in the manifest, not in directory names). */
private[catalog] final class StaticFileIndex(spark: SparkSession,
    root: Path, statuses: Seq[FileStatus])
  extends PartitioningAwareFileIndex(
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
    Map.empty, None) {

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] =
    scala.collection.mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)
  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }
  override def rootPaths: Seq[Path] = Seq(root)
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  // the base class resolves files by walking rootPaths through the
  // leaf-dir map (this list's parents are data/batch-* dirs, not the
  // root) — the list IS the answer, pruning already happened upstream
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
    Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
      InternalRow.empty, statuses.toArray))
  override def allFiles(): Seq[FileStatus] = statuses
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
}
