package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The commit-publish contract, proven over every primitive the table
  * can sit on — the same adversarial-matrix shape as
  * SnapshotHdfsBranchSpec, at the publisher level:
  *
  *  - localLink (POSIX hard link) and conditionalPut (S3-class
  *    create-if-absent) both satisfy the contract: N racers → exactly
  *    one winner, the published content is the winner's WHOLE body,
  *    losers get the IOException the optimistic retry loop keys on,
  *    and no tmp garbage outlives a publish (object-store publish
  *    creates nothing at all beyond the object).
  *  - the NON-atomic double (blind last-writer-wins put — a store
  *    without a conditional-write API) violates it: every racer
  *    "succeeds" and all bodies but one are silently discarded. That
  *    proven data loss is WHY the conditional primitive is a required
  *    part of [[CommitPublisher]]'s contract, not an optimization —
  *    the documented failure mode of hosting a multi-writer table on
  *    a bucket with no conditional put.
  *
  * (renameIfAbsent, the HDFS-class primitive, is exercised end-to-end
  * against the MockDfs FileSystem double in SnapshotHdfsBranchSpec —
  * including injected rename/create failures and crash garbage.)
  */
class CommitPublisherSpec extends AnyFunSuite {

  private def race(n: Int)(publish: Int => Unit): Seq[Either[Throwable, Int]] = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futs = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, Int]] {
          def call(): Either[Throwable, Int] = {
            gate.await()
            try { publish(i); Right(i) }
            catch { case t: Throwable => Left(t) }
          }
        })
      }
      gate.countDown()
      futs.map(_.get(30, TimeUnit.SECONDS))
    } finally pool.shutdown()
  }

  test("localLink: N racers on one version name -> one winner, whole content, no tmp garbage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cp").toString
    val dest = new Path(s"$dir/_snapshots/v0000001.json")
    val results = race(6) { i =>
      CommitPublisher.localLink.publish(dir, dest,
        s"body-of-writer-$i-${"x" * 1000}".getBytes("UTF-8"))
    }
    val winners = results.collect { case Right(i) => i }
    assert(winners.size == 1, s"exactly one publish may win, got $winners")
    results.collect { case Left(t) => t }.foreach(t =>
      assert(t.isInstanceOf[java.io.IOException],
        s"losers must surface the retry loop's IOException, got $t"))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest.toUri.getPath)), "UTF-8")
    assert(content == s"body-of-writer-${winners.head}-${"x" * 1000}",
      "the version must hold the winner's ENTIRE body — no tearing, no mixing")
    val leftovers = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/_snapshots")).toArray.map(_.toString)
    assert(leftovers.count(_.contains(".tmp-")) == 0,
      s"every writer's tmp file must be cleaned up, found $leftovers")
  }

  test("conditionalPut: one conditional put is claim+publish; losers fail; a crash leaves NOTHING") {
    val store = new MemoryObjectStore
    val pub = CommitPublisher.conditionalPut(store)
    val dest = new Path("mem://t/_snapshots/v0000001.json")
    val results = race(6) { i => pub.publish("mem://t", dest, s"body-$i".getBytes("UTF-8")) }
    val winners = results.collect { case Right(i) => i }
    assert(winners.size == 1, s"exactly one conditional put may create the key, got $winners")
    results.collect { case Left(t) => t }.foreach(t =>
      assert(t.isInstanceOf[java.io.IOException]))
    assert(store.get(dest.toString).map(new String(_, "UTF-8"))
      .contains(s"body-${winners.head}"))
    assert(store.keys == Set(dest.toString),
      "object-store publish writes ONE object: no tmp keys exist to leak on a crash")
    // the loser's retry onto the NEXT version (what SnapshotTable's
    // optimistic loop does) succeeds — the store is not wedged
    val next = new Path("mem://t/_snapshots/v0000002.json")
    pub.publish("mem://t", next, "retry-body".getBytes("UTF-8"))
    assert(store.get(next.toString).map(new String(_, "UTF-8")).contains("retry-body"))
  }

  test("the non-atomic double PROVES the failure mode: every racer 'wins' and commits are silently lost") {
    val store = MemoryObjectStore.nonAtomic
    val pub = CommitPublisher.conditionalPut(store)
    val dest = new Path("mem://t/_snapshots/v0000001.json")
    val results = race(6) { i => pub.publish("mem://t", dest, s"body-$i".getBytes("UTF-8")) }
    val winners = results.collect { case Right(i) => i }
    assert(winners.size == 6,
      "a blind-overwrite store tells every concurrent committer it succeeded")
    val survived = store.get(dest.toString).map(new String(_, "UTF-8")).get
    assert(winners.map(i => s"body-$i").contains(survived))
    // five of the six "successful" commits are gone — the lost-update
    // anomaly the conditional primitive exists to exclude
    assert(winners.map(i => s"body-$i").count(_ == survived) == 1,
      "all bodies but the last writer's are silently discarded")
  }

  test("localLink reclaims a STALE zero-length claim but not a fresh one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cp2").toString
    val destPath = java.nio.file.Paths.get(s"$dir/_snapshots/v0000001.json")
    java.nio.file.Files.createDirectories(destPath.getParent)
    // a FRESH empty claim is someone else's in-flight publish: lose the race
    java.nio.file.Files.write(destPath, Array.empty[Byte])
    val fresh = intercept[java.io.IOException] {
      CommitPublisher.localLink.publish(dir, new Path(destPath.toUri.toString),
        "steal".getBytes("UTF-8"))
    }
    assert(fresh != null)
    // aged past the stale horizon it is abandoned: reclaim and publish
    java.nio.file.Files.setLastModifiedTime(destPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    CommitPublisher.localLink.publish(dir, new Path(destPath.toUri.toString),
      "reclaimed".getBytes("UTF-8"))
    assert(new String(java.nio.file.Files.readAllBytes(destPath), "UTF-8") == "reclaimed")
  }
}
