package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout maintenance — the housekeeping a 100 TB table needs
  * that the reference's per-file writes (write-through FAISS etc.,
  * SURVEY.md §4 "do NOT replicate") would make pathological:
  *
  *  - [[compact]]: rewrite a fragmented parquet directory into
  *    ~targetBytes files (streaming upserts and per-batch appends
  *    accumulate small files; scan cost is per-file, so compaction is
  *    periodic maintenance, not a luxury);
  *  - [[writeRangeLayout]]: range-repartition + sort by a key before
  *    writing, so every output file owns a disjoint key range and
  *    parquet min/max stats prune whole files for range predicates
  *    (the 1-D complement of the z-order key).
  */
object Maintenance {

  /** Total bytes of data files under a directory. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `inputDir` into `outputDir` with ~targetBytes per file. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long): Int = {
    val bytes = dataBytes(spark, inputDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inputDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outputDir)
    nFiles
  }

  /** Write with a range-clustered layout on `key`: each file covers a
    * disjoint key range (provable from per-file min/max — see
    * MaintenanceSpec). */
  def writeRangeLayout(df: DataFrame, key: String, numFiles: Int, outputDir: String): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(outputDir)
}
