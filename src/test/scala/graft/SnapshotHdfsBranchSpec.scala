package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.tools.MockDfs

/** The commit protocol's NON-local branch (any scheme but `file:`),
  * driven through [[graft.tools.MockDfs]] — an HDFS-semantics
  * filesystem double whose rename fails-if-present atomically. The
  * local branch has its atomicity proven cross-process
  * (SnapshotRaceSpec); this spec proves the branch a real HDFS
  * deployment would run: winner-uniqueness under racing commits,
  * loser-retry through injected transient failures, stale-claim
  * recovery, and crash-garbage vacuum — none of which were previously
  * exercised (the branch's behavior was asserted only in comments).
  */
class SnapshotHdfsBranchSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.mockdfs.impl", classOf[MockDfs].getName)

  private def tmpRoot(): String =
    "mockdfs:" + Files.createTempDirectory("graft-hdfs").toString

  test("racing appends from 4 threads serialize: contiguous versions, no lost update, every manifest whole") {
    MockDfs.reset()
    val root = tmpRoot()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"),
      statsKey = Some("id"))
    val nWriters = 4
    val nOps = 3
    val pool = Executors.newFixedThreadPool(nWriters)
    val go = new CountDownLatch(1)
    val futures = (1 to nWriters).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          go.await()
          (0 until nOps).foreach { i =>
            SnapshotTable.append(spark, root,
              Seq((100L * w + i, s"w$w-a$i")).toDF("id", "v"),
              statsKey = Some("id"))
          }
        }
      })
    }
    go.countDown()
    futures.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()

    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (1 to 1 + nWriters * nOps),
      s"exactly one winner per version — contiguous, got $vs")
    // every manifest is fully parseable (no torn publishes)
    vs.foreach(v => assert(SnapshotTable.read(spark, root, Some(v)).count() >= 1))
    val rows = SnapshotTable.read(spark, root).filter(col("id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (for { w <- 1 to nWriters; i <- 0 until nOps }
      yield (100L * w + i, s"w$w-a$i")).toSet
    assert(rows == expected, "every writer's every append lands exactly once")
  }

  test("contested-key merges from 2 threads serialize: one surviving row, a writer's final merge") {
    MockDfs.reset()
    val root = tmpRoot()
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"),
      statsKey = Some("id"))
    val nOps = 3
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    val futures = (1 to 2).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          go.await()
          (0 until nOps).foreach { i =>
            SnapshotTable.merge(spark, root,
              Seq((0L, s"w$w-c$i")).toDF("id", "v"), key = "id")
          }
        }
      })
    }
    go.countDown()
    futures.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    val contested = SnapshotTable.read(spark, root)
      .filter(col("id") === 0L).collect().map(_.getString(1)).toSeq
    assert(contested.size == 1,
      s"contested key must have exactly one surviving row, got $contested")
    assert(Set(s"w1-c${nOps - 1}", s"w2-c${nOps - 1}").contains(contested.head),
      s"survivor must be some writer's FINAL merge, got ${contested.head}")
  }

  test("injected transient rename/create failures: the loser retries and every op lands exactly once") {
    val root = tmpRoot()
    SnapshotTable.create(spark, root, Seq((1L, "a")).toDF("id", "v"))
    MockDfs.failRenames.set(2) // next two namenode renames die mid-commit
    val v2 = SnapshotTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert(v2 == 2, "append must survive transient rename failures")
    MockDfs.failCreates.set(1) // tmp-manifest create dies once
    val v3 = SnapshotTable.append(spark, root, Seq((3L, "c")).toDF("id", "v"))
    assert(v3 == 3)
    MockDfs.reset()
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2, 3))
    assert(SnapshotTable.read(spark, root).count() == 3,
      "each op exactly once — a blind retry that re-committed would duplicate")
  }

  test("a crashed writer leaves only tmp garbage: vacuum sweeps it, no version is ever blocked") {
    MockDfs.reset()
    val root = tmpRoot()
    SnapshotTable.create(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // model a writer that died after writing its tmp manifest but
    // before the rename: a uniquely-named file in the log dir
    val localRoot = root.stripPrefix("mockdfs:")
    val orphan = java.nio.file.Paths.get(localRoot, "_snapshots",
      "v0000002.json.tmp-deadbeef")
    Files.write(orphan, "{\"version\":2,\"op\":\"append\"}\n".getBytes("UTF-8"))
    // the table stays fully writable — the crashed claim blocks nothing
    val v2 = SnapshotTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert(v2 == 2)
    val swept = SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(swept.contains("_snapshots/v0000002.json.tmp-deadbeef"),
      s"vacuum must sweep crashed writers' tmp manifests, swept=$swept")
    assert(SnapshotTable.versions(spark, root) == Seq(1, 2))
  }

  test("a stale zero-length claim on a version name is reclaimed; a fresh one is not stolen") {
    MockDfs.reset()
    val root = tmpRoot()
    SnapshotTable.create(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val localRoot = root.stripPrefix("mockdfs:")
    val claim = java.nio.file.Paths.get(localRoot, "_snapshots", "v0000002.json")
    // fresh empty file at the version name (external tampering /
    // pre-rename build's crash between create and close): benefit of
    // the doubt — the append burns its retries and fails loudly
    Files.createFile(claim)
    intercept[java.io.IOException] {
      SnapshotTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    }
    // aged past the staleness bar → reclaimed, table writable again
    Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * 60 * 1000))
    val v = SnapshotTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert(v == 2)
    assert(SnapshotTable.read(spark, root).count() == 2)
    // the reclaim's aside file is crash garbage; vacuum sweeps it
    val swept = SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(swept.exists(_.contains(".abandoned-")),
      s"vacuum must sweep the reclaimed claim, swept=$swept")
  }

  test("the full lifecycle runs on the non-local branch: merge + compact + expire + vacuum + time travel") {
    MockDfs.reset()
    val root = tmpRoot()
    SnapshotTable.create(spark, root,
      (0L until 40L).map(i => (i, s"r$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")), statsKey = Some("id"))
    SnapshotTable.merge(spark, root, Seq((7L, "UPD")).toDF("id", "v"), key = "id")
    assert(SnapshotTable.read(spark, root, Some(1))
      .filter(col("id") === 7L).head().getString(1) == "r7", "time travel")
    SnapshotTable.compact(spark, root, targetFiles = 2, statsKey = Some("id"))
    SnapshotTable.expireVersions(spark, root, keepLast = 1)
    val swept = SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(swept.nonEmpty, "expired versions' files must be reclaimed")
    val rows = SnapshotTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (0L until 40L).map(i => (i, if (i == 7) "UPD" else s"r$i")).toSet
    assert(rows == expected)
  }
}
