package graft.tools

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An HDFS-SEMANTICS test double backed by local disk, registered under
  * the `mockdfs://` scheme: the filesystem the snapshot table's
  * NON-local commit branch would actually run against in a real
  * deployment, with the two primitives that branch's atomicity rests on
  * implemented atomically (not check-then-act, which is what
  * RawLocalFileSystem gives and what the cross-process race spec caught
  * losing updates):
  *
  *  - `rename(src, dst)` FAILS when `dst` exists — HDFS semantics,
  *    where POSIX rename would silently replace. Implemented as
  *    link(2)+unlink, so two racing renames onto one destination
  *    resolve atomically: exactly one wins, the loser sees `false`.
  *  - `create(f, overwrite=false)` claims the name atomically
  *    (CREATE_NEW), like the namenode op it models.
  *
  * Failure injection ([[MockDfs.failRenames]]/[[MockDfs.failCreates]]):
  * the next N calls throw IOException BEFORE acting, modeling transient
  * RPC failures — the commit loop must retry and land each operation
  * exactly once. Directory renames (Spark's output committer) keep
  * rename-if-absent semantics via a plain move.
  */
class MockDfs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockdfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // failpoints target MANIFEST ops only — injecting into the data
    // write's task-committer renames would model a failed Spark job,
    // not a failed commit RPC
    if (dst.toString.contains("_snapshots"))
      MockDfs.maybeFail(MockDfs.failRenames, "rename")
    val s = pathToFile(src).toPath
    val d = pathToFile(dst).toPath
    if (java.nio.file.Files.isDirectory(s)) {
      // committer-style dir moves: dst never pre-exists in our use;
      // keep HDFS's fail-if-present contract without link tricks
      if (java.nio.file.Files.exists(d)) false
      else super.rename(src, dst)
    } else {
      try {
        java.nio.file.Files.createDirectories(d.getParent)
        java.nio.file.Files.createLink(d, s) // atomic EEXIST claim
        java.nio.file.Files.delete(s)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false // dst exists: lost
        case _: java.nio.file.NoSuchFileException => false // src gone: lost
      }
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (f.toString.contains("_snapshots"))
      MockDfs.maybeFail(MockDfs.failCreates, "create")
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
    else {
      // atomic claim-by-create, as on the namenode — never check-then-create
      val p = pathToFile(f).toPath
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      val os = java.nio.file.Files.newOutputStream(p,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      new FSDataOutputStream(new java.io.BufferedOutputStream(os, bufferSize), null)
    }
  }
}

object MockDfs {
  /** Decremented per call; while positive the call throws. */
  val failRenames = new AtomicInteger(0)
  val failCreates = new AtomicInteger(0)

  private def maybeFail(counter: AtomicInteger, op: String): Unit =
    if (counter.getAndUpdate(n => if (n > 0) n - 1 else 0) > 0)
      throw new java.io.IOException(s"injected $op failure")

  def reset(): Unit = { failRenames.set(0); failCreates.set(0) }
}
