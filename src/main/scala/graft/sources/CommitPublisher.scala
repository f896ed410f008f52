package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE primitive [[SnapshotTable]]'s commit protocol needs from a
  * storage system: publish a complete manifest body under its final
  * version name ATOMICALLY and AT MOST ONCE — the name appears with
  * the whole content exactly once or not at all, and a second publish
  * onto the same name must FAIL rather than replace. Claim and publish
  * are the same operation, so no window exists in which a paused
  * writer can wake up and overwrite a version another writer committed
  * (the reference's single-process pipeline gets this for free from
  * sequential execution, `/root/reference/src/managers/index_manager.py`;
  * a distributed engine has to buy it from the store).
  *
  * Implementations:
  *  - [[CommitPublisher.localLink]] — POSIX local filesystems: write a
  *    writer-unique tmp file, hard-link it onto the version name
  *    (link fails if the name exists), delete the tmp.
  *  - [[CommitPublisher.renameIfAbsent]] — HDFS-class stores: write a
  *    writer-unique tmp file, rename onto the version name (one atomic
  *    namenode op that fails when the destination exists) — the same
  *    protocol as the HDFS log-store committers of production table
  *    formats.
  *  - [[CommitPublisher.conditionalPut]] — S3-class object stores:
  *    one conditional put (create-if-absent of the whole object). No
  *    tmp file at all: object-store puts are already all-or-nothing,
  *    so the conditional put IS claim+publish in a single op. Proven
  *    against [[MemoryObjectStore]]; a real S3 binding would implement
  *    [[ObjectStore]] with `If-None-Match: *`.
  *
  * A store offering NONE of these (blind last-writer-wins put only)
  * cannot host the table safely — concurrent committers both "succeed"
  * and one version silently vanishes. That failure mode is proven, not
  * just asserted, by [[MemoryObjectStore.nonAtomic]] in the spec
  * matrix, which is exactly why the primitive is a required part of
  * this trait's contract rather than an optimization.
  *
  * Lost races surface as [[java.io.IOException]] — the signal
  * [[SnapshotTable]]'s optimistic retry loop catches to rebuild
  * against the new latest version.
  */
private[graft] trait CommitPublisher {
  /** Atomically bind `body` to `dest`, failing (IOException) if `dest`
    * already exists. `root` is the table root (for directory setup). */
  def publish(root: String, dest: Path, body: Array[Byte]): Unit
}

private[graft] object CommitPublisher {

  /** How long a zero-length manifest-name file may sit before a writer
    * may treat it as abandoned and reclaim the version name. The
    * current protocol never creates empty manifests (publish is one
    * atomic link/rename of the full content), so this only defends
    * against external tampering and leftovers of older builds. */
  private val StaleClaimMs = SnapshotTable.StaleClaimMs

  /** Local-filesystem publish: tmp + hard link. A hard link is one
    * atomic directory-entry creation that fails when the name exists —
    * the POSIX analog of rename-if-absent, without rename's
    * overwrite-on-collision hazard. */
  val localLink: CommitPublisher = new CommitPublisher {
    def publish(root: String, dest: Path, body: Array[Byte]): Unit = {
      val nio = java.nio.file.Paths.get(dest.toUri.getPath)
      java.nio.file.Files.createDirectories(nio.getParent)
      val tmp = nio.resolveSibling(
        nio.getFileName.toString + s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp, body)
      try {
        try java.nio.file.Files.createLink(nio, tmp)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            // dest already exists: usually a lost race (full manifest —
            // caller retries onto the next version), but a ZERO-LENGTH
            // dest (external tampering, or a claim left by a
            // pre-hard-link build that crashed mid-publish) would block
            // the version name forever since versions() skips it and no
            // commit can land on the name. Reclaim: move a stale empty
            // file aside atomically (move of a vanished source throws,
            // so exactly one recoverer wins) and publish; a FRESH empty
            // file gets the benefit of the doubt and surfaces as a
            // plain lost race.
            if (!reclaimStaleClaim(nio)) throw e
            java.nio.file.Files.createLink(nio, tmp)
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** HDFS-class publish: tmp + rename-if-absent. HDFS rename is one
    * atomic namenode op that FAILS when the destination exists, so
    * claim and publish are a single metadata op carrying the whole
    * content. A crashed writer leaves only a uniquely-named tmp file,
    * which [[SnapshotTable.vacuum]] sweeps. */
  def renameIfAbsent(f: FileSystem): CommitPublisher = new CommitPublisher {
    def publish(root: String, dest: Path, body: Array[Byte]): Unit = {
      f.mkdirs(dest.getParent)
      val tmp = new Path(dest.getParent,
        s"${dest.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, false)
      try out.write(body) finally out.close()
      var published = false
      try {
        published = f.rename(tmp, dest)
        if (!published && reclaimStaleClaimFs(f, dest))
          // a stale ZERO-LENGTH destination (external tampering, or a
          // crashed writer of a pre-rename build) was moved aside by
          // THIS caller — publish onto the reclaimed name
          published = f.rename(tmp, dest)
      } finally f.delete(tmp, false)
      if (!published)
        throw new java.io.IOException(s"lost commit race for $dest")
    }
  }

  /** S3-class publish: ONE conditional put of the whole manifest. No
    * tmp file, no rename — object-store puts are all-or-nothing, so
    * create-if-absent of the full object is claim+publish in a single
    * op, and a crashed writer leaves NOTHING (not even tmp garbage).
    * Stale-claim reclaim is unnecessary by construction: no code path
    * can create an empty object under a version name. */
  def conditionalPut(store: ObjectStore): CommitPublisher = new CommitPublisher {
    def publish(root: String, dest: Path, body: Array[Byte]): Unit =
      if (!store.putIfAbsent(dest.toString, body))
        throw new java.io.IOException(s"lost commit race for $dest")
  }

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

  /** [[reclaimStaleClaim]] for the HDFS-class branch: move an
    * abandoned (zero-length, stale) file occupying a version name
    * aside via the filesystem's atomic rename — exactly one recoverer
    * wins because a rename whose source has vanished fails. Returns
    * true iff THIS caller won and may publish onto the name. */
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
}

/** The object-store surface [[CommitPublisher.conditionalPut]] builds
  * on: a key-value blob store whose ONLY write primitive is
  * conditional create. Real bindings: S3 `PutObject` with
  * `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, Azure
  * `If-None-Match: *` — every major object store ships this today. */
private[graft] trait ObjectStore {
  /** Create `key` holding `body` iff `key` is absent — atomically.
    * True = this caller created it; false = the key already existed
    * (body untouched). */
  def putIfAbsent(key: String, body: Array[Byte]): Boolean
  def get(key: String): Option[Array[Byte]]
}

/** In-memory [[ObjectStore]] double for the commit-protocol spec
  * matrix: `putIfAbsent` is a single ConcurrentHashMap CAS — atomic
  * and conditional, like the real stores' conditional-put APIs. */
private[graft] class MemoryObjectStore extends ObjectStore {
  protected val blobs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  def putIfAbsent(key: String, body: Array[Byte]): Boolean =
    blobs.putIfAbsent(key, body.clone()) == null
  def get(key: String): Option[Array[Byte]] = Option(blobs.get(key)).map(_.clone())
  def keys: Set[String] = {
    import scala.jdk.CollectionConverters._
    blobs.keySet().asScala.toSet
  }
}

private[graft] object MemoryObjectStore {
  /** The ANTI-double: a store whose put is a blind last-writer-wins
    * overwrite (no conditional primitive) — what a bare bucket without
    * a conditional-write API offers. Publishing through it "succeeds"
    * for every racer and silently discards all bodies but the last,
    * which is exactly the failure mode the [[CommitPublisher]]
    * contract exists to exclude; the spec matrix proves the data loss
    * rather than asserting it. */
  def nonAtomic: MemoryObjectStore = new MemoryObjectStore {
    override def putIfAbsent(key: String, body: Array[Byte]): Boolean = {
      // deliberately NOT conditional: blind overwrite, every caller
      // told it "created" the object
      blobs.put(key, body.clone()); true
    }
  }
}
