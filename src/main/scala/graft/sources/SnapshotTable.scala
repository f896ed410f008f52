package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, max, min}

/** Minimal ACID table format — the transactional MERGE story the plain
  * parquet upsert lacks (reference J2 is delete-then-add inside one
  * process; concurrent writers at scale need a commit protocol):
  *
  *  - A table is a directory of immutable parquet data files plus a
  *    `_snapshots/` log of manifests, one per version; manifest N
  *    lists exactly the files visible at version N (copy-on-write),
  *    each with optional per-file min/max KEY STATS for data skipping.
  *  - COMMIT is one atomic filesystem operation: `create` of manifest
  *    vN+1 with overwrite=false. Two writers racing to the same version
  *    cannot both succeed; the loser re-reads the latest snapshot and
  *    retries against it (optimistic concurrency, Delta/Iceberg-style).
  *  - READERS never lock: they list `_snapshots`, pick the highest
  *    version (or any historical one — time travel), and read only the
  *    files that manifest names. A crashed writer leaves at most
  *    orphaned data files, never a torn table.
  *
  * MERGE (delete-then-add by key) uses the stats to rewrite ONLY the
  * files whose key range contains an updated key; untouched files are
  * carried into the new manifest verbatim — at 100 TB an upsert of one
  * document rewrites a handful of files, not the table. Files without
  * stats (non-integral keys, pre-stats manifests) conservatively
  * rewrite. The whole operation is invisible until the single manifest
  * create lands.
  */
object SnapshotTable {

  private val SnapshotDir = "_snapshots"
  private val MaxRetries = 20

  /** One manifest data-file line: relative path + optional min/max of
    * the table's merge key (integral keys only). */
  private final case class FileEntry(path: String, minKey: Option[Long], maxKey: Option[Long]) {
    def render: String =
      minKey.zip(maxKey).map { case (a, b) => s"$path\t$a\t$b" }.getOrElse(path)
    /** Could this file contain any of `keys` (sorted)? No stats → maybe. */
    def mayContain(keys: Array[Long]): Boolean =
      minKey.zip(maxKey).forall { case (mn, mx) =>
        val i = java.util.Arrays.binarySearch(keys, mn)
        val from = if (i >= 0) i else -i - 1
        from < keys.length && keys(from) <= mx
      }
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int): Path =
    new Path(root, f"$SnapshotDir/v$v%07d.json")

  /** All committed versions, ascending (empty for a fresh directory). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(root, SnapshotDir)
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir)
      // zero-length = claimed but not yet published (see commit)
      .filter(_.getLen > 0)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted.toSeq
  }

  private def readManifest(spark: SparkSession, root: String, v: Int): Seq[FileEntry] = {
    val in = fs(spark, root).open(manifestPath(root, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // header line {"version":N}, then one file entry per line
    text.linesIterator.drop(1).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => FileEntry(p, Some(mn.toLong), Some(mx.toLong))
        case _ => FileEntry(line, None, None)
      }
    }.toSeq
  }

  /** Write `df` as immutable data files under root/data/<uuid>/ and
    * return their entries — with per-file min/max stats of `statsKey`
    * when it resolves to an integral column.
    *
    * Stats come from ONE aggregate over the whole batch grouped by
    * `input_file_name()` — O(1) Spark jobs however many files the batch
    * produced. (The per-file loop this replaces issued one tiny job per
    * file: a compacted 100 TB table writes thousands of files per batch
    * and the driver-side round trips became the commit's critical
    * path.) The grouped collect is bounded by files-per-batch. */
  private def writeDataFiles(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None): Seq[FileEntry] = {
    val batch = s"data/batch-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$root/$batch")
    val f = fs(spark, root)
    val paths = f.listStatus(new Path(root, batch))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$batch/${s.getPath.getName}").sorted.toSeq
    val integralKey = statsKey.filter { k =>
      try df.select(df(k)).schema.head.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => true
        case _ => false
      } catch { case _: Exception => false }
    }
    integralKey match {
      case Some(k) =>
        val byFile: Map[String, (Long, Long)] = spark.read.parquet(s"$root/$batch")
          .groupBy(input_file_name().as("__file"))
          .agg(min(col(k)).cast("long").as("__mn"), max(col(k)).cast("long").as("__mx"))
          .collect()
          .flatMap { r =>
            // basename: input_file_name yields the full URI
            val name = r.getString(0).split('/').last
            if (r.isNullAt(1)) None else Some(name -> (r.getLong(1), r.getLong(2)))
          }.toMap
        paths.map { rel =>
          byFile.get(rel.split('/').last) match {
            case Some((mn, mx)) => FileEntry(rel, Some(mn), Some(mx))
            // all-null keys or an empty file: no stats → conservative
            case None => FileEntry(rel, None, None)
          }
        }
      case None => paths.map(FileEntry(_, None, None))
    }
  }

  /** Atomically commit `files` as the next version after `expected`.
    * The uniqueness primitive must be truly atomic per filesystem: on
    * HDFS-like stores `create(overwrite=false)` is an atomic namenode
    * op, but Hadoop's RawLocalFileSystem implements it as
    * check-then-create — two local writers can BOTH pass the check and
    * the second silently clobbers the first (lost update; caught by the
    * concurrent-writers test). Local paths therefore claim the version
    * with NIO `Files.createFile` (O_CREAT|O_EXCL, atomic in POSIX). */
  private def commit(spark: SparkSession, root: String, files: Seq[FileEntry],
      expected: Int): Int = {
    val v = expected + 1
    val body = (s"""{"version":$v}""" +: files.map(_.render)).mkString("\n")
    val p = manifestPath(root, v)
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(nio.getParent)
      // two atomic steps: claim the version (O_EXCL create, throws
      // FileAlreadyExistsException on a lost race), then publish the
      // content with an atomic rename — readers see either an
      // in-flight empty claim (which versions() skips) or the full
      // manifest, never a torn write
      try java.nio.file.Files.createFile(nio)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          // A writer that crashed between claim and publish leaves a
          // zero-length vN forever: versions() skips it, so no commit
          // of vN could ever succeed again and the table is
          // permanently unwritable. Recover: a zero-length claim older
          // than StaleClaimMs is abandoned — move it aside ATOMICALLY
          // to a unique name (rename of a missing source throws, so
          // only ONE recoverer can win; the loser rethrows into the
          // normal lost-race retry). A FRESH zero-length claim is a
          // live writer mid-publish and is never touched.
          if (!reclaimStaleClaim(nio)) throw e
          java.nio.file.Files.createFile(nio)
      }
      val tmp = nio.resolveSibling(
        nio.getFileName.toString + s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, nio,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val f = fs(spark, root)
      f.mkdirs(new Path(root, SnapshotDir))
      val out = f.create(p, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    v
  }

  /** How long a zero-length version claim may sit unpublished before
    * any writer may treat it as abandoned. The claim→publish window is
    * two local filesystem calls (microseconds); a minute of slack is
    * orders of magnitude beyond any GC pause that could stretch it. */
  private val StaleClaimMs = 60000L

  /** Atomically move an abandoned (zero-length, stale) claim aside.
    * Returns true iff THIS caller won the reclaim and may re-claim the
    * version; false if the claim is live/fresh/already gone. */
  private def reclaimStaleClaim(nio: java.nio.file.Path): Boolean = {
    import java.nio.file.{Files, StandardCopyOption}
    val stale =
      try Files.size(nio) == 0 &&
        Files.getLastModifiedTime(nio).toMillis < System.currentTimeMillis() - StaleClaimMs
      catch { case _: java.io.IOException => false } // vanished: publisher won
    if (!stale) return false
    val aside = nio.resolveSibling(
      nio.getFileName.toString + s".abandoned-${java.util.UUID.randomUUID().toString.take(8)}")
    try { Files.move(nio, aside, StandardCopyOption.ATOMIC_MOVE); true }
    catch { case _: java.io.IOException => false } // another recoverer won
  }

  /** Create a new table (version 1) or fail if one exists. `statsKey`
    * (usually the future merge key) enables data skipping from birth. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None): Int = {
    require(versions(spark, root).isEmpty, s"table already exists at $root")
    commit(spark, root, writeDataFiles(spark, root, df, statsKey), expected = 0)
  }

  /** Append rows: new files + all files of the snapshot appended onto. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None): Int =
    retrying(spark, root) { latest =>
      readManifest(spark, root, latest) ++ writeDataFiles(spark, root, df, statsKey)
    }

  /** MERGE: delete every row whose `key` appears in `updates`, then add
    * `updates` (J2 delete-then-add, key-scoped). Data skipping: only
    * files whose [min,max] key range contains an updated key are read
    * and rewritten; everything else carries forward by name.
    *
    * `maxPruneKeys` bounds the driver-side key collect that powers the
    * pruning: an update batch with more distinct keys than the cap is
    * table-sized, file skipping would save little, and materializing
    * its key set on the driver is exactly the OOM a 100 TB engine must
    * not risk — beyond the cap the merge falls back to rewriting every
    * file (correct, just unpruned). */
  def merge(spark: SparkSession, root: String, updates: DataFrame, key: String,
      maxPruneKeys: Int = 100000): Int = {
    // updates' files are written once; survivors re-derive per attempt
    val updateFiles = writeDataFiles(spark, root, updates, Some(key))
    // the update batch's distinct keys, for file pruning — gated on the
    // key TYPE (a lossy cast would yield nulls and wrongly prune
    // everything); non-integral keys disable skipping, never correctness
    val keyIsIntegral =
      try updates.select(updates(key)).schema.head.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => true
        case _ => false
      } catch { case _: Exception => false }
    val updateKeys: Option[Array[Long]] =
      if (!keyIsIntegral) None
      else {
        // limit(cap+1): the driver never holds more than cap+1 keys,
        // and one extra row is how "too many to prune with" is detected
        val ks = updates.select(updates(key).cast("long").as("__k"))
          .na.drop().distinct()
          .limit(maxPruneKeys + 1)
          .collect().map(_.getLong(0))
        if (ks.length > maxPruneKeys) None
        else { java.util.Arrays.sort(ks); Some(ks) }
      }
    retrying(spark, root) { latest =>
      val entries = readManifest(spark, root, latest)
      val (touched, untouched) = updateKeys match {
        case Some(keys) => entries.partition(_.mayContain(keys))
        case None => (entries, Seq.empty[FileEntry])
      }
      val rewritten =
        if (touched.isEmpty) Seq.empty[FileEntry]
        else {
          val current = spark.read.parquet(touched.map(e => s"$root/${e.path}"): _*)
          // alias, not rename: `key` may be a nested path (metadata.doc_id)
          val survivors = current.join(
            updates.select(updates(key).as("__mk")).distinct(),
            current(key) === col("__mk"), "left_anti")
          writeDataFiles(spark, root, survivors, Some(key))
        }
      untouched ++ rewritten ++ updateFiles
    }
  }

  /** Compaction: rewrite the CURRENT snapshot into ~`targetFiles`
    * larger files and commit the result as a new version — the
    * small-file remedy every copy-on-write table needs once many
    * incremental merges have fragmented it. Commits through the same
    * optimistic loop as any writer, so it can run concurrently with
    * upserts; historical versions keep reading their original files. */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 8,
      statsKey: Option[String] = None): Int =
    retrying(spark, root) { latest =>
      val current = read(spark, root, Some(latest))
      writeDataFiles(spark, root, current.repartition(targetFiles), statsKey)
    }

  /** Drop all snapshots except the last `keepLast` (their manifests are
    * deleted; time travel to them fails afterwards). Run [[vacuum]] to
    * reclaim the data files only they referenced. */
  def expireVersions(spark: SparkSession, root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val f = fs(spark, root)
    val expired = versions(spark, root).dropRight(keepLast)
    expired.foreach(v => f.delete(manifestPath(root, v), false))
    expired
  }

  /** Garbage-collect data files referenced by NO live manifest —
    * leftovers of crashed writers and of expired versions. Only files
    * older than `minAgeMs` are eligible: a concurrent writer's
    * just-written batch is not yet referenced by any manifest, and the
    * age floor is what keeps vacuum from eating it (the same retention
    * contract as Delta's VACUUM). Returns the deleted relative paths. */
  def vacuum(spark: SparkSession, root: String,
      minAgeMs: Long = 60L * 60 * 1000): Seq[String] = {
    val f = fs(spark, root)
    val referenced = versions(spark, root)
      .flatMap(v => readManifest(spark, root, v)).map(_.path).toSet
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val cutoff = System.currentTimeMillis() - minAgeMs
    val deleted = Seq.newBuilder[String]
    f.listStatus(dataDir).foreach { batch =>
      // only parquet data files are manifest-addressable; write markers
      // (_SUCCESS etc.) go when their whole batch dir is reclaimed
      f.listStatus(batch.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { file =>
          val rel = s"data/${batch.getPath.getName}/${file.getPath.getName}"
          if (!referenced.contains(rel) && file.getModificationTime < cutoff) {
            f.delete(file.getPath, false)
            deleted += rel
          }
        }
      val remaining = f.listStatus(batch.getPath)
      if (!remaining.exists(_.getPath.getName.endsWith(".parquet")) &&
        remaining.forall(_.getModificationTime < cutoff))
        f.delete(batch.getPath, true)
    }
    deleted.result()
  }

  /** Optimistic-concurrency loop: build the file list against the
    * latest version, try to commit latest+1; on a lost race, rebuild
    * against the new latest. */
  private def retrying(spark: SparkSession, root: String)(
      buildFiles: Int => Seq[FileEntry]): Int = {
    var attempt = 0
    while (true) {
      val latest = versions(spark, root).lastOption.getOrElse(
        throw new IllegalStateException(s"no table at $root"))
      val files = buildFiles(latest)
      try return commit(spark, root, files, latest)
      catch {
        case _: java.io.IOException if attempt < MaxRetries =>
          attempt += 1
          // tiny linear backoff: a lost race means another writer is
          // mid-publish; spinning full-speed against its in-flight
          // claim would burn the retry budget in microseconds
          Thread.sleep(math.min(200L, 10L * attempt))
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
    val files = readManifest(spark, root, v).map(e => s"$root/${e.path}")
    spark.read.parquet(files: _*)
  }
}
