package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal ACID table format — the transactional MERGE story the plain
  * parquet upsert lacks (reference J2 is delete-then-add inside one
  * process; concurrent writers at scale need a commit protocol):
  *
  *  - A table is a directory of immutable parquet data files plus a
  *    `_snapshots/` log of JSON manifests, one per version; manifest N
  *    lists exactly the files visible at version N (copy-on-write).
  *  - COMMIT is one atomic filesystem operation: `create` of manifest
  *    vN+1 with overwrite=false. Two writers racing to the same version
  *    cannot both succeed; the loser re-reads the latest snapshot and
  *    retries against it (optimistic concurrency, Delta/Iceberg-style).
  *  - READERS never lock: they list `_snapshots`, pick the highest
  *    version (or any historical one — time travel), and read only the
  *    files that manifest names. A crashed writer leaves at most
  *    orphaned data files, never a torn table.
  *
  * MERGE (delete-then-add by key) rewrites surviving rows + updates
  * into fresh files and commits a manifest naming only those — the
  * whole operation is invisible until the single manifest create lands.
  * (A production engine adds file-level pruning so only files
  * containing matched keys rewrite; the protocol is identical.)
  */
object SnapshotTable {

  private val SnapshotDir = "_snapshots"
  private val MaxRetries = 5

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int): Path =
    new Path(root, f"$SnapshotDir/v$v%07d.json")

  /** All committed versions, ascending (empty for a fresh directory). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(root, SnapshotDir)
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted.toSeq
  }

  private def readManifest(spark: SparkSession, root: String, v: Int): Seq[String] = {
    val in = fs(spark, root).open(manifestPath(root, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // one relative path per line after the header line {"version":N}
    text.linesIterator.drop(1).filter(_.nonEmpty).toSeq
  }

  /** Write `df` as immutable data files under root/data/<uuid>/ and
    * return their table-relative paths. */
  private def writeDataFiles(spark: SparkSession, root: String, df: DataFrame): Seq[String] = {
    val batch = s"data/batch-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$root/$batch")
    val f = fs(spark, root)
    f.listStatus(new Path(root, batch))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$batch/${s.getPath.getName}").sorted.toSeq
  }

  /** Atomically commit `files` as the next version after `expected`.
    * Returns the committed version. Throws after MaxRetries conflicts
    * IF the caller's snapshot went stale (callers that rebuild their
    * file list from latest state retry via [[merge]]'s loop instead). */
  private def commit(spark: SparkSession, root: String, files: Seq[String],
      expected: Int): Int = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root, SnapshotDir))
    val v = expected + 1
    val body = (s"""{"version":$v}""" +: files).mkString("\n")
    // overwrite=false → EXACTLY ONE writer can create this version
    val out = f.create(manifestPath(root, v), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    v
  }

  /** Create a new table (version 1) or fail if one exists. */
  def create(spark: SparkSession, root: String, df: DataFrame): Int = {
    require(versions(spark, root).isEmpty, s"table already exists at $root")
    commit(spark, root, writeDataFiles(spark, root, df), expected = 0)
  }

  /** Append rows: new files + all files of the snapshot appended onto. */
  def append(spark: SparkSession, root: String, df: DataFrame): Int =
    retrying(spark, root) { latest =>
      readManifest(spark, root, latest) ++ writeDataFiles(spark, root, df)
    }

  /** MERGE: delete every row whose `key` appears in `updates`, then add
    * `updates` (J2 delete-then-add, key-scoped). Copy-on-write: the new
    * snapshot names only freshly-written files. */
  def merge(spark: SparkSession, root: String, updates: DataFrame, key: String): Int = {
    // updates' files are written once; survivors re-derive per attempt
    val updateFiles = writeDataFiles(spark, root, updates)
    retrying(spark, root) { latest =>
      val current = read(spark, root, Some(latest))
      // alias, not rename: `key` may be a nested path (metadata.doc_id)
      val survivors = current.join(
        updates.select(updates(key).as("__mk")).distinct(),
        current(key) === org.apache.spark.sql.functions.col("__mk"), "left_anti")
      writeDataFiles(spark, root, survivors) ++ updateFiles
    }
  }

  /** Optimistic-concurrency loop: build the file list against the
    * latest version, try to commit latest+1; on a lost race, rebuild
    * against the new latest. */
  private def retrying(spark: SparkSession, root: String)(
      buildFiles: Int => Seq[String]): Int = {
    var attempt = 0
    while (true) {
      val latest = versions(spark, root).lastOption.getOrElse(
        throw new IllegalStateException(s"no table at $root"))
      val files = buildFiles(latest)
      try return commit(spark, root, files, latest)
      catch {
        case _: java.io.IOException if attempt < MaxRetries => attempt += 1
      }
    }
    -1 // unreachable
  }

  /** Read the table at `version` (default: latest). Time travel: any
    * committed version stays readable — its files are immutable. */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v does not exist (have $vs)")
    val files = readManifest(spark, root, v).map(rel => s"$root/$rel")
    spark.read.parquet(files: _*)
  }
}
