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

  /** Highest manifest format this build reads and the format it writes.
    * The header carries `"format":N` so future revisions are
    * self-describing: a reader seeing a NEWER format fails loudly
    * instead of misparsing lines it does not understand (the op field
    * and the schema line were added by prefix heuristics — this field
    * is what lets the NEXT evolution drop the heuristics). Format
    * history: 1 = headerless/op-header tables written before the field
    * existed (parsed leniently); 2 = header format field + optional
    * per-file row-count and byte-size columns; 3 = optional per-file
    * STRING key stats (base64 of the parquet binary min/max, compared
    * in unsigned byte order — the same order Spark sorts strings). */
  private val ManifestFormat = 3

  /** One manifest data-file line: relative path + optional min/max of
    * the table's merge key (integral keys only) + optional row count
    * (from the parquet footer at write time — powers DESCRIBE HISTORY
    * and empty-batch detection with zero data I/O) + optional file
    * size in bytes (from the write's own directory listing — what lets
    * [[ManifestFileIndex]] build its FileStatuses from the manifest
    * alone, no per-file RPCs at planning time). */
  private[sources] final case class FileEntry(path: String, minKey: Option[Long],
      maxKey: Option[Long], rows: Option[Long] = None, bytes: Option[Long] = None,
      minStr: Option[Array[Byte]] = None, maxStr: Option[Array[Byte]] = None) {
    def render: String = {
      def s(o: Option[Long]): String = o.map(_.toString).getOrElse("")
      def b64(o: Option[Array[Byte]]): String =
        o.map(java.util.Base64.getEncoder.withoutPadding.encodeToString).getOrElse("")
      if (minStr.isDefined || maxStr.isDefined)
        s"$path\t${s(minKey)}\t${s(maxKey)}\t${s(rows)}\t${s(bytes)}\t${b64(minStr)}\t${b64(maxStr)}"
      else if (rows.isEmpty && bytes.isEmpty)
        minKey.zip(maxKey).map { case (a, b) => s"$path\t$a\t$b" }.getOrElse(path)
      else if (bytes.isEmpty) s"$path\t${s(minKey)}\t${s(maxKey)}\t${s(rows)}"
      else s"$path\t${s(minKey)}\t${s(maxKey)}\t${s(rows)}\t${s(bytes)}"
    }
    /** Could this file contain any of `keys` (sorted)? No stats → maybe. */
    def mayContain(keys: Array[Long]): Boolean =
      minKey.zip(maxKey).forall { case (mn, mx) =>
        val i = java.util.Arrays.binarySearch(keys, mn)
        val from = if (i >= 0) i else -i - 1
        from < keys.length && keys(from) <= mx
      }
    /** Could this file hold any key in [lo, hi]? No stats → maybe. */
    def overlaps(lo: Long, hi: Long): Boolean =
      minKey.zip(maxKey).forall { case (mn, mx) => mx >= lo && mn <= hi }
    /** String-key form of [[mayContain]]: `keys` sorted by
      * [[SnapshotTable.byteOrder]] (unsigned bytes — Spark's own
      * string order). No string stats → maybe. */
    def mayContainStr(keys: Array[Array[Byte]]): Boolean =
      minStr.zip(maxStr).forall { case (mn, mx) =>
        val i = java.util.Arrays.binarySearch(keys, mn, byteOrder)
        val from = if (i >= 0) i else -i - 1
        from < keys.length && byteOrder.compare(keys(from), mx) <= 0
      }
    /** String-key form of [[overlaps]]. */
    def overlapsStr(lo: Array[Byte], hi: Array[Byte]): Boolean =
      minStr.zip(maxStr).forall { case (mn, mx) =>
        byteOrder.compare(mx, lo) >= 0 && byteOrder.compare(mn, hi) <= 0
      }
  }

  /** Unsigned lexicographic byte order — the order parquet records
    * BINARY min/max in AND the order Spark compares strings (UTF-8
    * bytes), so manifest string ranges and engine-side predicates
    * agree on every corner (supplementary characters included). */
  private[sources] val byteOrder: java.util.Comparator[Array[Byte]] =
    new java.util.Comparator[Array[Byte]] {
      override def compare(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)
    }

  private[sources] def parseEntry(line: String): FileEntry = {
    def opt(s: String): Option[Long] = if (s.isEmpty) None else Some(s.toLong)
    def optB(s: String): Option[Array[Byte]] =
      if (s.isEmpty) None else Some(java.util.Base64.getDecoder.decode(s))
    // limit -1: string-stats lines may end in an empty field, which
    // the default split would silently drop (changing the arity)
    line.split("\t", -1) match {
      case Array(p, mn, mx, r, b, lo, hi) =>
        FileEntry(p, opt(mn), opt(mx), opt(r), opt(b), optB(lo), optB(hi))
      case Array(p, mn, mx, r, b) => FileEntry(p, opt(mn), opt(mx), opt(r), opt(b))
      case Array(p, mn, mx, r)    => FileEntry(p, opt(mn), opt(mx), opt(r))
      case Array(p, mn, mx)       => FileEntry(p, opt(mn), opt(mx), None)
      case _                      => FileEntry(line, None, None, None)
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
    val header = allLines.headOption.getOrElse("")
    // formats ≤ ManifestFormat parse leniently (older lines simply lack
    // optional fields); a NEWER format is a hard error — misparsing a
    // future manifest's lines as file paths would silently corrupt reads
    val fmt = """"format":(\d+)""".r.findFirstMatchIn(header)
      .map(_.group(1).toInt).getOrElse(1)
    require(fmt <= ManifestFormat,
      s"manifest v$v at $root uses format $fmt; this reader supports <= $ManifestFormat")
    val op = """"op":"([a-z]+)"""".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse("unknown")
    val lines = allLines.drop(1).filter(_.nonEmpty)
    val schema = lines.find(_.startsWith("S{"))
      .map(l => org.apache.spark.sql.types.DataType.fromJson(l.drop(1))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val entries = lines.filterNot(_.startsWith("S{")).map(parseEntry)
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
    // sizes ride the listing the write already pays for — recorded in
    // the manifest so planning-time file skipping never stats files
    val paths = f.listStatus(new Path(root, batch))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => (s"$batch/${s.getPath.getName}", s.getLen)).sortBy(_._1).toSeq
    // keyKind: Some((name, isString)) when the stats key is a type we
    // can range-prune on — integral (long stats) or string (binary
    // min/max in unsigned byte order); anything else disables stats
    val keyKind: Option[(String, Boolean)] = statsKey.flatMap { k =>
      try df.select(df(k)).schema.head.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => Some((k, false))
        case org.apache.spark.sql.types.StringType => Some((k, true))
        case _ => None
      } catch { case _: Exception => None }
    }
    // every file gets one footer read: row counts always (DESCRIBE
    // HISTORY + empty-batch detection), key min/max when the stats key
    // is prunable — still zero Spark jobs and zero data I/O
    if (paths.isEmpty) Seq.empty
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(16, paths.size)))
      try {
        val futures = paths.map { case (rel, len) =>
          pool.submit(new java.util.concurrent.Callable[FileEntry] {
            override def call(): FileEntry = {
              val (rows, st, stS) =
                try footerInfo(conf, new Path(root, rel), keyKind)
                catch { case _: Exception => (None, None, None) }
              FileEntry(rel, st.map(_._1), st.map(_._2), rows, Some(len),
                stS.map(_._1), stS.map(_._2))
            }
          })
        }
        futures.map(_.get())
      } finally pool.shutdown()
    }
  }

  /** Row count + min/max of column `key` across all row groups of one
    * parquet file, read from the footer (no data pages touched). The
    * row count is the footer's authoritative per-block sum. Integral
    * keys yield the long range; string keys yield the BINARY min/max
    * (parquet records them in unsigned byte order — the same order
    * Spark compares strings, so the range is sound for pruning).
    * Stats are None when the key is absent/statless/all-null or a row
    * group's statistics are unknown — the caller treats None as "may
    * contain anything". */
  private def footerInfo(conf: org.apache.hadoop.conf.Configuration,
      file: Path, keyKind: Option[(String, Boolean)]):
      (Option[Long], Option[(Long, Long)], Option[(Array[Byte], Array[Byte])]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      var nRows = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var mnB: Array[Byte] = null
      var mxB: Array[Byte] = null
      var seen = false
      var statsValid = keyKind.isDefined
      val blocks = reader.getFooter.getBlocks.iterator()
      while (blocks.hasNext) {
        val block = blocks.next()
        nRows += block.getRowCount
        if (statsValid) {
          val cols = block.getColumns.iterator()
          while (cols.hasNext) {
            val c = cols.next()
            if (c.getPath.toDotString == keyKind.get._1) {
              val st = c.getStatistics
              // a single statless/unknown row group poisons the range
              if (st == null || st.isEmpty) statsValid = false
              else if (st.hasNonNullValue) {
                (st.genericGetMin, st.genericGetMax) match {
                  case (a: java.lang.Integer, b: java.lang.Integer) if !keyKind.get._2 =>
                    mn = math.min(mn, a.longValue); mx = math.max(mx, b.longValue); seen = true
                  case (a: java.lang.Long, b: java.lang.Long) if !keyKind.get._2 =>
                    mn = math.min(mn, a.longValue); mx = math.max(mx, b.longValue); seen = true
                  case (a: org.apache.parquet.io.api.Binary,
                        b: org.apache.parquet.io.api.Binary) if keyKind.get._2 =>
                    val (lo, hi) = (a.getBytes, b.getBytes)
                    if (mnB == null || byteOrder.compare(lo, mnB) < 0) mnB = lo
                    if (mxB == null || byteOrder.compare(hi, mxB) > 0) mxB = hi
                    seen = true
                  case _ => statsValid = false
                }
              }
            }
          }
        }
      }
      val longStats =
        if (statsValid && seen && keyKind.exists(!_._2)) Some((mn, mx)) else None
      val strStats =
        if (statsValid && seen && keyKind.exists(_._2)) Some((mnB, mxB)) else None
      (Some(nRows), longStats, strStats)
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
    // header (format revision + version + operation that produced it),
    // then the version's SCHEMA (S-prefixed json line): every version
    // records exactly the shape its readers must apply, so a table
    // whose files span schema evolutions still reads every version
    // deterministically (inference from an arbitrary file's footer
    // would drop or misorder evolved columns)
    val body = (s"""{"version":$v,"format":$ManifestFormat,"op":"$op"}""" +:
      s"S${schema.json}" +: files.map(_.render))
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
      // HDFS-like stores: write the FULL manifest to a writer-unique
      // tmp file, close it, then RENAME onto the version name. HDFS
      // rename is one atomic namenode op that FAILS when the
      // destination exists, so claim and publish are a single metadata
      // op carrying the whole content — the same protocol as Delta's
      // HDFS log store. The earlier create(overwrite=false)+write form
      // was atomic only at claim time: a writer crashing between
      // create and close left a zero-length (or torn) file UNDER THE
      // VERSION NAME, blocking that version forever. With rename, a
      // crashed writer leaves only a uniquely-named tmp file, which
      // [[vacuum]] sweeps. Object stores without atomic
      // rename-if-absent semantics (e.g. S3 without a coordination
      // layer) need a different publish primitive — the same
      // documented limitation every HDFS-committer-based table format
      // carries.
      val f = fs(spark, root)
      f.mkdirs(new Path(root, SnapshotDir))
      val tmp = new Path(root,
        s"$SnapshotDir/${p.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      var published = false
      try {
        published = f.rename(tmp, p)
        if (!published && reclaimStaleClaimFs(f, p))
          // a stale ZERO-LENGTH destination (external tampering, or a
          // crashed writer of a pre-rename build) was moved aside by
          // THIS caller — publish onto the reclaimed name
          published = f.rename(tmp, p)
      } finally f.delete(tmp, false)
      if (!published)
        throw new java.io.IOException(s"lost commit race for $p")
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

  /** [[reclaimStaleClaim]] for the HDFS-like branch: move an abandoned
    * (zero-length, stale) file occupying a version name aside via the
    * filesystem's atomic rename — exactly one recoverer wins because a
    * rename whose source has vanished fails. Returns true iff THIS
    * caller won and may publish onto the name. */
  private def reclaimStaleClaimFs(f: FileSystem, p: Path): Boolean = {
    val st =
      try f.getFileStatus(p)
      catch { case _: java.io.IOException => return false } // vanished
    if (st.getLen != 0 ||
      st.getModificationTime >= System.currentTimeMillis() - StaleClaimMs) return false
    val aside = new Path(p.getParent,
      p.getName + s".abandoned-${java.util.UUID.randomUUID().toString.take(8)}")
    try f.rename(p, aside)
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

  /** Column-name normalization for schema comparison: Spark resolves
    * names case-INsensitively by default, so the manifest schema must
    * too — a case-sensitive compare would let a batch column 'ID'
    * slip past the type check against table column 'id' and commit a
    * case-duplicate schema that poisons every subsequent read. */
  private def norm(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  /** The widened type of a table/batch column pair, or None when the
    * pair is irreconcilable. Equal types (modulo nullability) always
    * reconcile; with `allowWiden`, int→long and float→double reconcile
    * to the wider side — lossless upcasts only, applied recursively
    * through structs (same field names), arrays, and maps. Everything
    * else (string↔int, long→int, decimal changes) is irreconcilable at
    * any setting: silent lossy coercion on a 100 TB table is how data
    * dies. */
  private def widenType(t: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType,
      allowWiden: Boolean): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val (nt, nb) = (deepNullable(t), deepNullable(b))
    if (nt == nb) Some(nt)
    else if (!allowWiden) None
    else (nt, nb) match {
      case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case (s1: StructType, s2: StructType)
          if s1.fields.map(f => norm(f.name)).sameElements(s2.fields.map(f => norm(f.name))) =>
        val merged = s1.fields.zip(s2.fields).map { case (f1, f2) =>
          widenType(f1.dataType, f2.dataType, allowWiden)
            .map(dt => f1.copy(dataType = dt, nullable = true))
        }
        if (merged.forall(_.isDefined)) Some(StructType(merged.map(_.get))) else None
      case (ArrayType(e1, _), ArrayType(e2, _)) =>
        widenType(e1, e2, allowWiden).map(ArrayType(_, containsNull = true))
      case (MapType(k1, v1, _), MapType(k2, v2, _)) =>
        for {
          k <- widenType(k1, k2, allowWiden)
          v <- widenType(v1, v2, allowWiden)
        } yield MapType(k, v, valueContainsNull = true)
      case _ => None
    }
  }

  /** Union of table and batch schemas by top-level column name
    * (case-insensitive, matching Spark's resolution): table columns
    * keep their order and canonical name, genuinely new batch columns
    * append. Same-name columns must agree on dataType modulo
    * nullability, or — with `allowWiden` — reconcile via lossless
    * int→long / float→double widening (opt-in: rejection stays the
    * default, a widened table column commits to the new manifest and
    * older files upcast on read). */
  private def evolveSchema(table: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType,
      allowWiden: Boolean = false): org.apache.spark.sql.types.StructType = {
    val dup = batch.fieldNames.groupBy(norm).filter(_._2.length > 1)
    require(dup.isEmpty,
      s"schema evolution rejected: batch columns differ only by case: " +
        dup.values.map(_.mkString("/")).mkString(", "))
    val evolvedExisting = table.fields.map { tf =>
      batch.fields.find(bf => norm(bf.name) == norm(tf.name)) match {
        case Some(bf) =>
          val dt = widenType(tf.dataType, bf.dataType, allowWiden).getOrElse(
            throw new IllegalArgumentException(
              s"schema evolution rejected: column '${tf.name}' is ${tf.dataType} " +
                s"in the table but ${bf.dataType} in the batch" +
                (if (allowWiden) "" else " (lossless widening is opt-in via allowWiden)")))
          tf.copy(dataType = dt, nullable = true)
        case None => tf
      }
    }
    val tableNames = table.fieldNames.map(norm).toSet
    widened(org.apache.spark.sql.types.StructType(
      evolvedExisting ++ batch.fields.filterNot(bf => tableNames.contains(norm(bf.name)))))
  }

  /** Project `df` onto `schema`: present columns (matched
    * case-insensitively, renamed to the schema's canonical case) pass
    * through — cast when a widening evolved the column's type — missing
    * columns null-fill, order normalized to the schema's. */
  private def alignTo(df: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(schema.fields.map { f =>
      df.columns.find(c => norm(c) == norm(f.name)) match {
        case Some(c) =>
          val base = df(c)
          val sameType =
            deepNullable(df.schema(df.columns.indexOf(c)).dataType) == deepNullable(f.dataType)
          (if (sameType) base else base.cast(f.dataType)).as(f.name)
        case None =>
          org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }
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
    * conflict on an existing column — unless `allowWiden` opts into
    * lossless int→long / float→double widening. */
  def append(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None, allowWiden: Boolean = false): Int =
    appendImpl(spark, root, df, statsKey, allowWiden, skipIfEmpty = false).get

  /** [[append]] that skips the commit when the batch turns out to be
    * EMPTY: the per-file row counts ride the footer reads the write
    * already does (zero extra Spark jobs), so callers that would
    * otherwise run a count/isEmpty action just to avoid committing
    * no-op versions (a streaming ingest whose micro-batch was all
    * duplicates) get the check for free. Returns None — with the
    * just-written empty files removed — instead of committing. */
  def appendIfNonEmpty(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String] = None, allowWiden: Boolean = false): Option[Int] =
    appendImpl(spark, root, df, statsKey, allowWiden, skipIfEmpty = true)

  private object EmptyBatch extends Exception

  private def appendImpl(spark: SparkSession, root: String, df: DataFrame,
      statsKey: Option[String], allowWiden: Boolean,
      skipIfEmpty: Boolean): Option[Int] = {
    var written: Seq[FileEntry] = Seq.empty
    try Some(retrying(spark, root, op = "append") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val evolved = evolveSchema(schemaOf(spark, root, parsed), df.schema, allowWiden)
      val newFiles = writeDataFiles(spark, root, alignTo(df, evolved), statsKey)
      written = newFiles
      // skip only on POSITIVE evidence of emptiness: every file's
      // footer row count known and zero (or no files at all) — an
      // unreadable footer conservatively commits
      if (skipIfEmpty && newFiles.forall(_.rows.contains(0L))) throw EmptyBatch
      (parsed._2 ++ newFiles, evolved)
    })
    catch {
      case EmptyBatch =>
        val f = fs(spark, root)
        written.map(e => new Path(root, e.path).getParent).distinct
          .foreach(dir => try f.delete(dir, true) catch { case _: Exception => () })
        None
    }
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
      maxPruneKeys: Int = 100000, allowWiden: Boolean = false): Int = {
    // updates' files are written once; survivors re-derive per attempt
    val updateFiles = writeDataFiles(spark, root, updates, Some(key))
    // the update batch's distinct keys, for file pruning — gated on the
    // key TYPE (a lossy cast would yield nulls and wrongly prune
    // everything): integral keys prune on the long range, STRING keys
    // on the binary range (unsigned byte order — the order both
    // parquet's stats and Spark's string comparisons use); any other
    // type disables skipping, never correctness
    val keyDt =
      try Some(updates.select(updates(key)).schema.head.dataType)
      catch { case _: Exception => None }
    // limit(cap+1): the driver never holds more than cap+1 keys, and
    // one extra row is how "too many to prune with" is detected
    val updateKeys: Option[Array[Long]] = keyDt match {
      case Some(org.apache.spark.sql.types.LongType) |
           Some(org.apache.spark.sql.types.IntegerType) =>
        val ks = updates.select(updates(key).cast("long").as("__k"))
          .na.drop().distinct()
          .limit(maxPruneKeys + 1)
          .collect().map(_.getLong(0))
        if (ks.length > maxPruneKeys) None
        else { java.util.Arrays.sort(ks); Some(ks) }
      case _ => None
    }
    val updateStrKeys: Option[Array[Array[Byte]]] = keyDt match {
      case Some(org.apache.spark.sql.types.StringType) =>
        val ks = updates.select(updates(key).as("__k"))
          .na.drop().distinct()
          .limit(maxPruneKeys + 1)
          .collect().map(_.getString(0).getBytes("UTF-8"))
        if (ks.length > maxPruneKeys) None
        else { java.util.Arrays.sort(ks, byteOrder); Some(ks) }
      case _ => None
    }
    retrying(spark, root, op = "merge") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val tableSchema = schemaOf(spark, root, parsed)
      val evolved = evolveSchema(tableSchema, updates.schema, allowWiden)
      val entries = parsed._2
      val (touched, untouched) = (updateKeys, updateStrKeys) match {
        case (Some(keys), _) => entries.partition(_.mayContain(keys))
        case (_, Some(ks)) => entries.partition(_.mayContainStr(ks))
        case _ => (entries, Seq.empty[FileEntry])
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
    * upserts; historical versions keep reading their original files.
    *
    * With `cluster = true` (and a `statsKey`) the rewrite
    * RANGE-partitions on the key instead of round-robin: the output
    * files carry DISJOINT key ranges, so the manifest stats become
    * maximally selective — a point-key merge rewrites exactly one file
    * and a [[readRange]] probe scans exactly the files its range
    * touches. Incremental merges interleave key ranges over time;
    * clustered compaction is how maintenance RESTORES pruning power
    * (the role OPTIMIZE ZORDER plays for other copy-on-write formats,
    * in its one-dimensional form). */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 8,
      statsKey: Option[String] = None, cluster: Boolean = false): Int =
    retrying(spark, root, op = "compact") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val schema = schemaOf(spark, root, parsed)
      val files = parsed._2.map(e => s"$root/${e.path}")
      val current = spark.read.schema(schema).parquet(files: _*)
      val laidOut = statsKey match {
        case Some(k) if cluster =>
          current.repartitionByRange(targetFiles, col(k))
        case _ => current.repartition(targetFiles)
      }
      (writeDataFiles(spark, root, laidOut, statsKey), schema)
    }

  /** Retention rewrite: commit a new version holding only the rows
    * matching `keep`, laid out like a compaction (targetFiles;
    * optionally range-clustered on the stats key). This is the
    * state-EXPIRY primitive — TTL eviction of a streaming dedup
    * index, predicate deletes — and unlike [[compact]] it deliberately
    * CHANGES the row set, so it commits with op "rewrite": history
    * never lets a row-dropping rewrite masquerade as a compaction.
    * Copy-on-write as everywhere — historical versions keep reading
    * their original rows until expired and vacuumed. */
  def retainWhere(spark: SparkSession, root: String,
      keep: org.apache.spark.sql.Column, targetFiles: Int = 8,
      statsKey: Option[String] = None, cluster: Boolean = false): Int =
    retrying(spark, root, op = "rewrite") { latest =>
      val parsed = manifestParsed(spark, root, latest)
      val schema = schemaOf(spark, root, parsed)
      val files = parsed._2.map(e => s"$root/${e.path}")
      val kept = spark.read.schema(schema).parquet(files: _*).filter(keep)
      val laidOut = statsKey match {
        case Some(k) if cluster => kept.repartitionByRange(targetFiles, col(k))
        case _ => kept.repartition(targetFiles)
      }
      (writeDataFiles(spark, root, laidOut, statsKey), schema)
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

  /** One history row per live version. `nRows` is -1 when any of the
    * version's files predates row-count tracking (unknown ≠ zero). */
  final case class HistoryEntry(version: Int, op: String, nFiles: Int,
      nColumns: Int, withStats: Int, nRows: Long)

  /** Table history — the DESCRIBE HISTORY surface: for every live
    * version, the operation that committed it, its file count, its
    * recorded column count, how many files carry skipping stats, and
    * its ROW COUNT (summed from the per-file footer counts the write
    * path recorded — the first thing users reach for in a history).
    * Driver-side metadata reads only (one manifest read per version),
    * no Spark jobs. Versions committed before op tracking report
    * "unknown"; expired versions are simply absent. */
  def history(spark: SparkSession, root: String): Seq[HistoryEntry] =
    versions(spark, root).map { v =>
      val (op, schemaOpt, entries) = manifestFull(spark, root, v)
      HistoryEntry(v, op, entries.size,
        schemaOpt.map(_.fields.length).getOrElse(-1),
        entries.count(_.minKey.isDefined),
        if (entries.forall(_.rows.isDefined)) entries.flatMap(_.rows).sum else -1L)
    }

  /** Read the table at `version` (default: latest). Time travel: any
    * committed version stays readable — its files are immutable, and
    * each version reads with ITS OWN recorded schema (a version
    * committed before a column was added never shows that column;
    * files older than an evolution null-fill the evolved columns). */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame =
    readImpl(spark, root, version, bounds = None)

  /** [[read]] pruned to the files whose key-stats range intersects
    * `[lo, hi]` — file-level data skipping on the READ path, from the
    * same manifest stats the merge path prunes with. Files without
    * stats are conservatively kept. The contract is the same as
    * manifest pruning everywhere: never affects which ROWS exist in
    * the files kept (callers filter rows themselves; this only bounds
    * which files are scanned), so a probe-side join against the pruned
    * frame sees every key in range. */
  def readRange(spark: SparkSession, root: String, lo: Long, hi: Long,
      version: Option[Int] = None): DataFrame =
    readImpl(spark, root, version, bounds = Some((lo, hi)))

  /** Read the table with manifest-stats file skipping integrated into
    * CATALYST: the returned frame's scan is backed by a
    * [[ManifestFileIndex]], so any pushed data filter on `key`
    * (`.filter($"doc_id" === 5)`, `BETWEEN`, `IN`, range predicates)
    * prunes files at PLANNING time from the manifest's min/max stats —
    * no explicit range API, no directory listing, no per-file RPCs
    * (sizes ride the manifest). This is the Spark-idiomatic form of
    * [[readRange]]: the optimizer decides what reaches the scan and
    * the index turns those conjuncts into file skips, the same
    * integration point log-structured table formats use. Row-level
    * filtering stays with the engine — the index only bounds which
    * FILES are scanned, so keeping a file never changes results. */
  def readIndexed(spark: SparkSession, root: String, key: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v does not exist (have $vs)")
    val parsed = manifestParsed(spark, root, v)
    val schema = schemaOf(spark, root, parsed)
    val index = new ManifestFileIndex(spark, root, parsed._2, key)
    org.apache.spark.sql.graftbridge.Bridge.parquetRelation(spark, index, schema)
  }

  private def readImpl(spark: SparkSession, root: String, version: Option[Int],
      bounds: Option[(Long, Long)]): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v does not exist (have $vs)")
    val parsed = manifestParsed(spark, root, v)
    val (schemaOpt, entries) = parsed
    val kept = bounds match {
      case Some((lo, hi)) => entries.filter(_.overlaps(lo, hi))
      case None => entries
    }
    if (kept.isEmpty) {
      // fully pruned: an empty frame with the version's schema
      val sch = schemaOf(spark, root, parsed)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
    } else {
      val files = kept.map(e => s"$root/${e.path}")
      schemaOpt match {
        case Some(sch) => spark.read.schema(sch).parquet(files: _*)
        case None => spark.read.parquet(files: _*)
      }
    }
  }
}

/** A [[org.apache.spark.sql.execution.datasources.FileIndex]] served
  * from a snapshot manifest: the file list, sizes, AND per-file key
  * stats all come from one manifest read, and `listFiles` applies the
  * scan's pushed data filters against those stats — file-level
  * skipping decided at PLANNING time by the optimizer's own conjuncts,
  * the same integration point log-structured table formats use for
  * their log-backed indexes. Conservative by construction: only
  * conjuncts that provably bound `key` ([[ManifestFileIndex.bounds]])
  * tighten the range, everything else keeps every file, and kept
  * files still go through the engine's row-level filtering — so
  * results never depend on how much was pruned.
  */
private[sources] final class ManifestFileIndex(
    spark: SparkSession,
    root: String,
    entries: Seq[SnapshotTable.FileEntry],
    key: String)
  extends org.apache.spark.sql.execution.datasources.FileIndex {

  import org.apache.hadoop.fs.FileStatus
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  // FileStatus straight from the manifest (size recorded at write
  // time); only pre-size manifest entries pay a per-file RPC
  private val fileStatuses: Seq[(FileStatus, SnapshotTable.FileEntry)] = {
    lazy val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    entries.map { e =>
      val p = new Path(root, e.path)
      val st = e.bytes match {
        case Some(len) => new FileStatus(len, false, 1, len, 0L, p)
        case None => f.getFileStatus(p)
      }
      (st, e)
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val b = ManifestFileIndex.bounds(dataFilters, key)
    val ord = SnapshotTable.byteOrder
    val contradictory =
      b.longBounds.exists { case (lo, hi) => lo > hi } ||
        (b.strLo.zip(b.strHi)).exists { case (lo, hi) => ord.compare(lo, hi) > 0 }
    val kept =
      if (contradictory) Seq.empty
      else fileStatuses.filter { case (_, e) =>
        b.longBounds.forall { case (lo, hi) => e.overlaps(lo, hi) } &&
          e.minStr.zip(e.maxStr).forall { case (mn, mx) =>
            b.strLo.forall(lo => ord.compare(mx, lo) >= 0) &&
              b.strHi.forall(hi => ord.compare(mn, hi) <= 0)
          }
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }

  override def inputFiles: Array[String] = fileStatuses.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = fileStatuses.map(_._1.getLen).sum

  override def partitionSchema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
}

private[sources] object ManifestFileIndex {
  import org.apache.spark.sql.catalyst.expressions._

  /** What the filter conjuncts provably impose on `key`: a long range
    * for integral comparisons, independent lower/upper byte bounds
    * (unsigned order) for string comparisons. Absent members impose
    * nothing. */
  private[sources] final case class KeyBounds(
      longBounds: Option[(Long, Long)],
      strLo: Option[Array[Byte]],
      strHi: Option[Array[Byte]])

  /** The tightest bounds the conjuncts impose on `key`. Strictly
    * conservative: unrecognized shapes (disjunctions, expressions over
    * the key, unsupported literal types) contribute no bound, and
    * STRICT string inequalities use their non-strict bound (the
    * byte-successor games a strict byte bound needs aren't worth one
    * extra boundary file). */
  private[sources] def bounds(filters: Seq[Expression], key: String): KeyBounds = {
    val ord = SnapshotTable.byteOrder
    def isKey(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        a.name.toLowerCase(java.util.Locale.ROOT) == key.toLowerCase(java.util.Locale.ROOT)
      case _ => false
    }
    def litVal(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Byte, _) => Some(v.toLong)
      case _ => None
    }
    def litStr(e: Expression): Option[Array[Byte]] = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => Some(v.getBytes)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var any = false
    var loB: Array[Byte] = null
    var hiB: Array[Byte] = null
    def raiseLo(v: Long): Unit = { lo = lo max v; any = true }
    def lowerHi(v: Long): Unit = { hi = hi min v; any = true }
    def raiseLoB(v: Array[Byte]): Unit =
      if (loB == null || ord.compare(v, loB) > 0) loB = v
    def lowerHiB(v: Array[Byte]): Unit =
      if (hiB == null || ord.compare(v, hiB) < 0) hiB = v
    def eq(l: Expression): Unit = {
      litVal(l).foreach { v => raiseLo(v); lowerHi(v) }
      litStr(l).foreach { v => raiseLoB(v); lowerHiB(v) }
    }
    // the key is on one side, literal `l` on the other; strict long
    // bounds tighten by one, strict string bounds stay non-strict
    def keyGreater(l: Expression, strict: Boolean): Unit = {
      litVal(l).foreach { v => raiseLo(if (strict && v != Long.MaxValue) v + 1 else v) }
      litStr(l).foreach(raiseLoB)
    }
    def keyLess(l: Expression, strict: Boolean): Unit = {
      litVal(l).foreach { v => lowerHi(if (strict && v != Long.MinValue) v - 1 else v) }
      litStr(l).foreach(lowerHiB)
    }
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a, l) if isKey(a) => eq(l)
      case EqualTo(l, a) if isKey(a) => eq(l)
      case EqualNullSafe(a, l) if isKey(a) => eq(l)
      case EqualNullSafe(l, a) if isKey(a) => eq(l)
      case GreaterThan(a, l) if isKey(a) => keyGreater(l, strict = true)
      case GreaterThanOrEqual(a, l) if isKey(a) => keyGreater(l, strict = false)
      case LessThan(a, l) if isKey(a) => keyLess(l, strict = true)
      case LessThanOrEqual(a, l) if isKey(a) => keyLess(l, strict = false)
      // literal-on-the-left comparisons, mirrored
      case GreaterThan(l, a) if isKey(a) => keyLess(l, strict = true)
      case GreaterThanOrEqual(l, a) if isKey(a) => keyLess(l, strict = false)
      case LessThan(l, a) if isKey(a) => keyGreater(l, strict = true)
      case LessThanOrEqual(l, a) if isKey(a) => keyGreater(l, strict = false)
      case In(a, vs) if isKey(a) && vs.nonEmpty && vs.forall(v => litVal(v).isDefined) =>
        val longs = vs.flatMap(litVal)
        raiseLo(longs.min); lowerHi(longs.max)
      case In(a, vs) if isKey(a) && vs.nonEmpty && vs.forall(v => litStr(v).isDefined) =>
        val bs = vs.flatMap(litStr)
        raiseLoB(bs.reduce((x, y) => if (ord.compare(x, y) <= 0) x else y))
        lowerHiB(bs.reduce((x, y) => if (ord.compare(x, y) >= 0) x else y))
      case _ => ()
    }
    KeyBounds(
      if (any) Some((lo, hi)) else None,
      Option(loB),
      Option(hiB))
  }
}
