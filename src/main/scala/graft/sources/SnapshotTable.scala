package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal ACID table format — the transactional MERGE story the plain
  * parquet upsert lacks (reference J2 is delete-then-add inside one
  * process; concurrent writers at scale need a commit protocol):
  *
  *  - A table is a directory of immutable parquet data files plus a
  *    `_snapshots/` log of manifests, one per version; manifest N
  *    lists exactly the files visible at version N (copy-on-write),
  *    each with optional per-file min/max KEY STATS for data skipping,
  *    plus the version's SCHEMA (append/merge may add columns — see
  *    [[append]]; every version reads with its own recorded schema).
  *  - COMMIT is one atomic filesystem operation: manifest vN+1 appears
  *    under its final name exactly once or not at all (hard-link
  *    publish on local filesystems, create-with-overwrite=false on
  *    HDFS-like stores). Two writers racing to the same version cannot
  *    both succeed; the loser re-reads the latest snapshot and retries
  *    against it (optimistic concurrency, Delta/Iceberg-style).
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

  /** One manifest read, fully parsed: header op, recorded schema if
    * any, file entries. Header line {"version":N,"op":...}, optional
    * S<schema-json> line, then one file entry per line. Callers
    * needing more than one field use THIS — a manifest read is a
    * filesystem round trip on the commit critical path, not something
    * to repeat per field. */
  private def manifestParsed(spark: SparkSession, root: String, v: Int):
      (Option[org.apache.spark.sql.types.StructType], Seq[FileEntry]) =
    manifestFull(spark, root, v) match { case (_, s, e) => (s, e) }

  private def manifestFull(spark: SparkSession, root: String, v: Int):
      (String, Option[org.apache.spark.sql.types.StructType], Seq[FileEntry]) = {
    val in = fs(spark, root).open(manifestPath(root, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val allLines = text.linesIterator.toSeq
    val op = """"op":"([a-z]+)"""".r.findFirstMatchIn(allLines.headOption.getOrElse(""))
      .map(_.group(1)).getOrElse("unknown")
    val lines = allLines.drop(1).filter(_.nonEmpty)
    val schema = lines.find(_.startsWith("S{"))
      .map(l => org.apache.spark.sql.types.DataType.fromJson(l.drop(1))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val entries = lines.filterNot(_.startsWith("S{")).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => FileEntry(p, Some(mn.toLong), Some(mx.toLong))
        case _ => FileEntry(line, None, None)
      }
    }
    (op, schema, entries)
  }

  private def readManifest(spark: SparkSession, root: String, v: Int): Seq[FileEntry] =
    manifestParsed(spark, root, v)._2

  /** The schema recorded in version `v`'s manifest, if any (manifests
    * written before schema tracking carry none — their reads fall back
    * to parquet inference). */
  def readSchema(spark: SparkSession, root: String, v: Int): Option[org.apache.spark.sql.types.StructType] =
    manifestParsed(spark, root, v)._1

  /** Write `df` as immutable data files under root/data/<uuid>/ and
    * return their entries — with per-file min/max stats of `statsKey`
    * when it resolves to an integral column.
    *
    * Stats come from the PARQUET FOOTERS of the just-written files —
    * zero Spark jobs and zero data I/O. The parquet writer already
    * computed per-row-group min/max for every column; re-deriving them
    * with an aggregate (what this replaces) re-read the entire batch on
    * the write path — at 100 TB that doubled write I/O for numbers
    * sitting in a few KB of footer metadata. Footer reads are
    * driver-side, ~KB each, parallelized across a small pool so a
    * thousands-of-files compaction batch doesn't serialize on
    * round-trip latency. Any unreadable/statless footer degrades to
    * no-stats (conservative rewrite), never to a wrong range. */
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
        val conf = spark.sparkContext.hadoopConfiguration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(16, paths.size)))
        try {
          val futures = paths.map { rel =>
            pool.submit(new java.util.concurrent.Callable[FileEntry] {
              override def call(): FileEntry = {
                val st =
                  try footerStats(conf, new Path(root, rel), k)
                  catch { case _: Exception => None }
                FileEntry(rel, st.map(_._1), st.map(_._2))
              }
            })
          }
          futures.map(_.get())
        } finally pool.shutdown()
      case None => paths.map(FileEntry(_, None, None))
    }
  }

  /** Min/max of column `key` across all row groups of one parquet file,
    * read from the footer (no data pages touched). None when the column
    * is missing, non-integral, statless, or all-null — the caller
    * treats None as "may contain anything". */
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
      file: Path, key: String): Option[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var seen = false
      val blocks = reader.getFooter.getBlocks.iterator()
      while (blocks.hasNext) {
        val cols = blocks.next().getColumns.iterator()
        while (cols.hasNext) {
          val c = cols.next()
          if (c.getPath.toDotString == key) {
            val st = c.getStatistics
            // a single statless/unknown row group poisons the range
            if (st == null || st.isEmpty) return None
            if (st.hasNonNullValue) {
              val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                case (a: java.lang.Integer, b: java.lang.Integer) =>
                  (a.longValue, b.longValue)
                case (a: java.lang.Long, b: java.lang.Long) =>
                  (a.longValue, b.longValue)
                case _ => return None
              }
              mn = math.min(mn, lo)
              mx = math.max(mx, hi)
              seen = true
            }
          }
        }
      }
      if (seen) Some((mn, mx)) else None
    } finally reader.close()
  }

  /** Atomically commit `files` as the next version after `expected`.
    * The uniqueness primitive must be truly atomic per filesystem: on
    * HDFS-like stores `create(overwrite=false)` is an atomic namenode
    * op, but Hadoop's RawLocalFileSystem implements it as
    * check-then-create — two local writers can BOTH pass the check and
    * the second silently clobbers the first (lost update; caught by the
    * cross-process race spec). Local paths therefore publish with
    * `Files.createLink` (link(2), atomic EEXIST in POSIX): the full
    * manifest is written to a writer-unique tmp file and HARD-LINKED
    * into the version name in ONE atomic metadata op. Claim and publish
    * are the same operation, so there is no window in which a paused
    * writer can wake up and overwrite a version another writer
    * committed in the meantime — nothing in this protocol ever replaces
    * an existing manifest. Readers see either no manifest or the whole
    * manifest; a crashed writer leaves only a tmp file (never a blocked
    * version), which [[vacuum]] sweeps. */
  private def commit(spark: SparkSession, root: String, files: Seq[FileEntry],
      schema: org.apache.spark.sql.types.StructType, expected: Int,
      op: String): Int = {
    val v = expected + 1
    // header (version + operation that produced it), then the
    // version's SCHEMA (S-prefixed json line): every version records
    // exactly the shape its readers must apply, so a table whose files
    // span schema evolutions still reads every version
    // deterministically (inference from an arbitrary file's footer
    // would drop or misorder evolved columns)
    val body = (s"""{"version":$v,"op":"$op"}""" +: s"S${schema.json}" +: files.map(_.render))
      .mkString("\n")
    val p = manifestPath(root, v)
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(nio.getParent)
      val tmp = nio.resolveSibling(
        nio.getFileName.toString + s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      try {
        try java.nio.file.Files.createLink(nio, tmp)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            // vN already exists: usually a lost race (full manifest —
            // retry onto vN+1), but a ZERO-LENGTH vN (external
            // tampering, or a claim left by a pre-hard-link build that
            // crashed mid-publish) would block version N forever since
            // versions() skips it and no commit can land on the name.
            // Reclaim: move a stale empty file aside atomically (rename
            // of a missing source throws, so exactly one recoverer
            // wins) and publish; a FRESH empty file gets the benefit of
            // the doubt and surfaces as a plain lost race.
            if (!reclaimStaleClaim(nio)) throw e
            java.nio.file.Files.createLink(nio, tmp)
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val f = fs(spark, root)
      f.mkdirs(new Path(root, SnapshotDir))
      val out = f.create(p, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    v
  }

  /** How long a zero-length manifest-name file may sit before a writer
    * may treat it as abandoned and reclaim the version name. The
    * current protocol never creates empty manifests (publish is one
    * atomic link of the full content), so this only defends against
    * external tampering and leftovers of older builds. */
  private val StaleClaimMs = 60000L

  /** Atomically move an abandoned (zero-length, stale) claim aside.
    * Returns true iff THIS caller won the reclaim and may publish the
    * version; false if the file is fresh, non-empty, or already gone. */
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

  /** Nullability widened at EVERY nesting level: parquet round-trips
    * don't preserve Spark's nullability flags faithfully (a constructed
    * frame's non-null struct field reads back nullable), and evolved
    * columns are null-filled in pre-evolution files — recording
    * everything nullable is the only honest contract a manifest schema
    * can make, and comparing types modulo nullability is the only
    * comparison that doesn't falsely reject a same-shaped batch. */
  private def deepNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType =>
        StructType(s.fields.map(f =>
          f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(deepNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(deepNullable(m.keyType), deepNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private def widened(s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    deepNullable(s).asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Union of table and batch schemas by top-level column name: table
    * columns keep their order, genuinely new batch columns append.
    * Same-name columns must agree on dataType modulo nullability —
    * silent type coercion on a 100 TB table is how data dies; widening
    * is a deliberate future feature, not a default. */
  private def evolveSchema(table: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    table.fields.foreach { tf =>
      batch.fields.find(_.name == tf.name).foreach { bf =>
        require(deepNullable(bf.dataType) == deepNullable(tf.dataType),
          s"schema evolution rejected: column '${tf.name}' is ${tf.dataType} " +
            s"in the table but ${bf.dataType} in the batch")
      }
    }
    widened(org.apache.spark.sql.types.StructType(
      table.fields ++ batch.fields.filterNot(bf => table.fieldNames.contains(bf.name))))
  }

  /** Project `df` onto `schema`: present columns pass through, missing
    * columns null-fill, order normalized to the schema's. */
  private def alignTo(df: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)

  /** The schema readers of `v` must apply: recorded in the manifest, or
    * (pre-schema-tracking manifests) inferred from the files. */
  private def schemaOf(spark: SparkSession, root: String,
      parsed: (Option[org.apache.spark.sql.types.StructType], Seq[FileEntry])): org.apache.spark.sql.types.StructType =
    parsed._1.getOrElse {
      val files = parsed._2.map(e => s"$root/${e.path}")
      widened(spark.read.parquet(files: _*).schema)
    }

  /** Create a new table (version 1) or fail if one exists. `statsKey`
    * (usually the future merge key) enables data skipping from birth. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None): Int = {
    require(versions(spark, root).isEmpty, s"table already exists at $root")
    commit(spark, root, writeDataFiles(spark, root, df, statsKey),
      widened(df.schema), expected = 0, op = "create")
  }

  /** Append rows: new files + all files of the snapshot appended onto.
    * The batch may carry NEW columns (recorded in the new version's
    * schema; earlier files null-fill them on read) but never a type
    * conflict on an existing column. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None): Int =
    retrying(spark, root, op = "append") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val evolved = evolveSchema(schemaOf(spark, root, parsed), df.schema)
      (parsed._2 ++
        writeDataFiles(spark, root, alignTo(df, evolved), statsKey), evolved)
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
    retrying(spark, root, op = "merge") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val tableSchema = schemaOf(spark, root, parsed)
      val evolved = evolveSchema(tableSchema, updates.schema)
      val entries = parsed._2
      val (touched, untouched) = updateKeys match {
        case Some(keys) => entries.partition(_.mayContain(keys))
        case None => (entries, Seq.empty[FileEntry])
      }
      val rewritten =
        if (touched.isEmpty) Seq.empty[FileEntry]
        else {
          // table schema applied explicitly: touched files may predate
          // an earlier evolution and lack its columns (null-filled)
          val current = spark.read.schema(tableSchema)
            .parquet(touched.map(e => s"$root/${e.path}"): _*)
          // alias, not rename: `key` may be a nested path (metadata.doc_id)
          val survivors = current.join(
            updates.select(updates(key).as("__mk")).distinct(),
            current(key) === col("__mk"), "left_anti")
          writeDataFiles(spark, root, alignTo(survivors, evolved), Some(key))
        }
      (untouched ++ rewritten ++ updateFiles, evolved)
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
    retrying(spark, root, op = "compact") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val schema = schemaOf(spark, root, parsed)
      val files = parsed._2.map(e => s"$root/${e.path}")
      val current = spark.read.schema(schema).parquet(files: _*)
      (writeDataFiles(spark, root, current.repartition(targetFiles), statsKey), schema)
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

  /** Garbage-collect files referenced by NO live manifest — leftovers
    * of crashed writers and of expired versions, in BOTH the data
    * directory and the `_snapshots` log (crashed publishes leave
    * `.tmp-*` files; stale-claim recovery leaves `.abandoned-*`). Only
    * files older than `minAgeMs` are eligible: a concurrent writer's
    * just-written batch / in-flight tmp manifest is not yet visible to
    * any manifest, and the age floor is what keeps vacuum from eating
    * it (the same retention contract as Delta's VACUUM). Returns the
    * deleted relative paths. */
  def vacuum(spark: SparkSession, root: String,
      minAgeMs: Long = 60L * 60 * 1000): Seq[String] = {
    val f = fs(spark, root)
    val referenced = versions(spark, root)
      .flatMap(v => readManifest(spark, root, v)).map(_.path).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val deleted = Seq.newBuilder[String]
    // log-dir garbage: anything that is not a committed v*.json
    // manifest. Zero-length manifest-name files are left to the
    // stale-claim reclaim path — deleting one here would race it.
    val snapDir = new Path(root, SnapshotDir)
    if (f.exists(snapDir)) f.listStatus(snapDir).foreach { s =>
      val n = s.getPath.getName
      if (!n.matches("v\\d+\\.json") && s.getModificationTime < cutoff &&
        f.delete(s.getPath, false))
        deleted += s"$SnapshotDir/$n"
    }
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return deleted.result()
    f.listStatus(dataDir).foreach { batch =>
      // only parquet data files are manifest-addressable; write markers
      // (_SUCCESS etc.) go when their whole batch dir is reclaimed
      f.listStatus(batch.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { file =>
          val rel = s"data/${batch.getPath.getName}/${file.getPath.getName}"
          // count as reclaimed only what the filesystem confirms gone
          if (!referenced.contains(rel) && file.getModificationTime < cutoff &&
            f.delete(file.getPath, false))
            deleted += rel
        }
      val remaining = f.listStatus(batch.getPath)
      if (!remaining.exists(_.getPath.getName.endsWith(".parquet")) &&
        remaining.forall(_.getModificationTime < cutoff))
        f.delete(batch.getPath, true)
    }
    deleted.result()
  }

  /** Optimistic-concurrency loop: build the file list + schema against
    * the latest version, try to commit latest+1; on a lost race,
    * rebuild against the new latest (including re-evolving the schema —
    * the winner may have evolved it differently). */
  private def retrying(spark: SparkSession, root: String, op: String)(
      buildFiles: Int => (Seq[FileEntry], org.apache.spark.sql.types.StructType)): Int = {
    var attempt = 0
    while (true) {
      val latest = versions(spark, root).lastOption.getOrElse(
        throw new IllegalStateException(s"no table at $root"))
      val (files, schema) = buildFiles(latest)
      try return commit(spark, root, files, schema, latest, op)
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

  /** One history row per live version. */
  final case class HistoryEntry(version: Int, op: String, nFiles: Int,
      nColumns: Int, withStats: Int)

  /** Table history — the DESCRIBE HISTORY surface: for every live
    * version, the operation that committed it, its file count, its
    * recorded column count, and how many files carry skipping stats.
    * Driver-side metadata reads only (one manifest read per version),
    * no Spark jobs. Versions committed before op tracking report
    * "unknown"; expired versions are simply absent. */
  def history(spark: SparkSession, root: String): Seq[HistoryEntry] =
    versions(spark, root).map { v =>
      val (op, schemaOpt, entries) = manifestFull(spark, root, v)
      HistoryEntry(v, op, entries.size,
        schemaOpt.map(_.fields.length).getOrElse(-1),
        entries.count(_.minKey.isDefined))
    }

  /** Read the table at `version` (default: latest). Time travel: any
    * committed version stays readable — its files are immutable, and
    * each version reads with ITS OWN recorded schema (a version
    * committed before a column was added never shows that column;
    * files older than an evolution null-fill the evolved columns). */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v does not exist (have $vs)")
    val (schemaOpt, entries) = manifestParsed(spark, root, v)
    val files = entries.map(e => s"$root/${e.path}")
    schemaOpt match {
      case Some(sch) => spark.read.schema(sch).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }
}
