package graft.catalog

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotTable

/** Iceberg-style METADATA TABLES: a snapshot table's own metadata,
  * queryable by name through the same catalog —
  *
  * {{{
  * SELECT * FROM graft.ns.tbl.files     -- per-file manifest facts
  * SELECT * FROM graft.ns.tbl.history   -- one row per live version
  * SELECT * FROM graft.ns.tbl.partitions -- SHOW PARTITIONS with stats
  * }}}
  *
  * The underlying facts are [[SnapshotTable.filesDf]] (path, rows,
  * bytes, key ranges, stats identity, dv state) and
  * [[SnapshotTable.history]] (version, op, file/column/row counts) —
  * driver-side manifest reads, no data I/O. The scan is a
  * [[LocalScan]]: metadata is bounded by the file/version count, so
  * it plans as a local table and every downstream filter/aggregate is
  * ordinary Spark. `VERSION AS OF` composes with `files` (an old
  * version's manifest is that version's file list). Reference analog:
  * the collection-status introspection of index_manager.py:288-323,
  * made a queryable relation. */
private[catalog] final class GraftMetadataTable(spark: SparkSession,
    root: String, ident: String, kind: String, pinnedVersion: Option[Int])
  extends Table with SupportsRead {

  override def name(): String = ident

  override def schema(): StructType = kind match {
    case "files" =>
      SnapshotTable.filesDf(spark, root, pinnedVersion).schema
    case "partitions" =>
      SnapshotTable.partitionsDf(spark, root, pinnedVersion).schema
    case "history" => GraftMetadataTable.HistorySchema
    case "detail" => GraftMetadataTable.DetailSchema
  }

  override def capabilities(): java.util.Set[TableCapability] =
    Collections.unmodifiableSet(java.util.EnumSet.of(TableCapability.BATCH_READ))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schema()
        override def rows(): Array[InternalRow] = kind match {
          case "files" =>
            GraftMetadataTable.collectRows(
              SnapshotTable.filesDf(spark, root, pinnedVersion))
          case "partitions" =>
            GraftMetadataTable.collectRows(
              SnapshotTable.partitionsDf(spark, root, pinnedVersion))
          case "history" =>
            import org.apache.spark.sql.Row
            GraftMetadataTable.collectRows(spark.createDataFrame(
              new java.util.ArrayList[Row](scala.jdk.CollectionConverters
                .SeqHasAsJava(SnapshotTable.history(spark, root).map(h =>
                  Row(h.version, h.op, h.nFiles, h.nColumns, h.withStats,
                    h.nRows))).asJava),
              GraftMetadataTable.HistorySchema))
          case "detail" =>
            import org.apache.spark.sql.Row
            val t = SnapshotTable.describeDetail(spark, root)
            GraftMetadataTable.collectRows(spark.createDataFrame(
              java.util.Collections.singletonList(Row(
                t.version, t.liveVersions, t.nFiles, t.totalBytes,
                if (t.nRows < 0) null else java.lang.Long.valueOf(t.nRows),
                t.statsKey.orNull, t.statsKey2.orNull,
                t.dvFiles,
                if (t.dvRows < 0) null else java.lang.Long.valueOf(t.dvRows),
                t.chainDepth, t.nConstraints, t.mappedColumns,
                t.declaredBuckets.map(Integer.valueOf).orNull,
                t.bucketedLayout.map(Integer.valueOf).orNull,
                t.declaredZorder, t.zorderedLayout,
                if (t.partitionCols.isEmpty) null
                else t.partitionCols.mkString(","))),
              GraftMetadataTable.DetailSchema))
        }
        override def description(): String = s"GraftMetadata($kind, $root)"
      }
    }
}

private[catalog] object GraftMetadataTable {
  /** The metadata relations addressable as `<table>.<name>`. */
  val Kinds: Set[String] = Set("files", "history", "partitions", "detail")

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_columns", IntegerType, nullable = false),
    StructField("with_stats", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  /** DESCRIBE DETAIL as a one-row relation (`<table>.detail`): the
    * head version's size/debt/layout facts — everything a maintenance
    * scheduler reads, SQL-addressable, zero data I/O. Unknown counts
    * come back NULL (not a sentinel). */
  val DetailSchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("live_versions", IntegerType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("stats_key", StringType, nullable = true),
    StructField("stats_key2", StringType, nullable = true),
    StructField("dv_files", IntegerType, nullable = false),
    StructField("dv_rows", LongType, nullable = true),
    StructField("chain_depth", IntegerType, nullable = false),
    StructField("n_constraints", IntegerType, nullable = false),
    StructField("mapped_columns", IntegerType, nullable = false),
    StructField("declared_buckets", IntegerType, nullable = true),
    StructField("bucketed_layout", IntegerType, nullable = true),
    StructField("declared_zorder", BooleanType, nullable = false),
    StructField("zordered_layout", BooleanType, nullable = false),
    StructField("partition_cols", StringType, nullable = true)))

  /** Driver-rows for a LocalScan — bounded by the manifest's file or
    * version count by construction. */
  def collectRows(df: org.apache.spark.sql.DataFrame): Array[InternalRow] =
    df.queryExecution.executedPlan.executeCollect()
}
