package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** CROSS-PROCESS proof of the snapshot-table commit protocol.
  *
  * Forked JVMs ([[graft.tools.RaceWriter]]) — separate processes,
  * separate Spark sessions, separate filesystem clients — race
  * appends, merges (disjoint AND contested keys), and compactions
  * against one table root. Same-JVM tests (threads) cannot prove the
  * claim the protocol makes: on a local filesystem the only thing
  * serializing two PROCESSES is the atomicity of the publish primitive
  * itself (hard-link EEXIST). Asserted over each race:
  *  - exactly one winner per version: versions come out contiguous,
  *    every manifest fully parseable (no torn/zero-length manifests);
  *  - no lost updates: every writer's every operation is reflected;
  *  - contested-key merges SERIALIZE: one surviving row whose value is
  *    some writer's final merge (not a torn mix, not a duplicate);
  *  - compaction racing a writer never loses or duplicates rows.
  */
class SnapshotRaceSpec extends SparkSpec {
  import spark.implicits._

  private val OpsPerWriter = 4

  private def launch(root: String, goFile: String, wid: Int, n: Int, mode: String): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val classpath = System.getProperty("java.class.path")
    // forward the test JVM's --add-opens (Spark on JDK 17 needs them)
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val addOpens = inArgs.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" => Seq(a, inArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
    }.flatten
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", classpath, "graft.tools.RaceWriter",
      root, wid.toString, n.toString, goFile, mode)).asJava
    new ProcessBuilder(cmd)
      .redirectOutput(new java.io.File(s"$root/writer$wid.out"))
      .redirectErrorStream(true)
      .start()
  }

  private def await(root: String, ps: Seq[Process]): Unit =
    try {
      ps.foreach { p =>
        assert(p.waitFor(300, TimeUnit.SECONDS), "racing writer must finish in the window")
      }
      ps.zipWithIndex.foreach { case (p, i) =>
        def diag: String =
          try new String(Files.readAllBytes(Paths.get(s"$root/writer${i + 1}.out")), "UTF-8").takeRight(800)
          catch { case _: Exception => "<no output>" }
        assert(p.exitValue() == 0, s"writer ${i + 1} failed:\n$diag")
      }
    } finally ps.foreach(_.destroyForcibly())

  test("two JVMs racing append+merge+contested-merge: serialized, no lost updates") {
    val root = Files.createTempDirectory("graft-race").toString
    val goFile = s"$root/.go"
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"),
      statsKey = Some("id"))
    val ps = Seq(launch(root, goFile, 1, OpsPerWriter, "mix"),
      launch(root, goFile, 2, OpsPerWriter, "mix"))
    Files.createFile(Paths.get(goFile)) // both sessions up enough to spin; go
    await(root, ps)

    // exactly one winner per version: contiguous, every manifest whole
    val totalOps = 1 + 2 * (3 * OpsPerWriter) // create + 2 × (appends + merges + contested)
    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (1 to totalOps), s"versions must be contiguous, got $vs")
    vs.foreach { v =>
      assert(SnapshotTable.read(spark, root, Some(v)).count() >= 1,
        s"manifest v$v must be fully readable")
    }
    // no lost updates on the disjoint keys: each writer's merged rows, once
    val finalRows = SnapshotTable.read(spark, root)
      .filter(col("id") =!= 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (for {
      wid <- Seq(1L, 2L); i <- 0 until OpsPerWriter
    } yield (1000L * wid + i) -> s"w$wid-m$i").toSet
    assert(finalRows == expected,
      s"every op must land exactly once; diff=${(finalRows diff expected) ++ (expected diff finalRows)}")
    // contested key: merges on id 0 must SERIALIZE — exactly one row
    // survives and it is some writer's FINAL contested merge
    val contested = SnapshotTable.read(spark, root)
      .filter(col("id") === 0L).collect().map(_.getString(1)).toSeq
    assert(contested.size == 1,
      s"contested key must have exactly one surviving row, got $contested")
    val last = OpsPerWriter - 1
    assert(Set(s"w1-c$last", s"w2-c$last").contains(contested.head),
      s"survivor must be a writer's final contested merge, got ${contested.head}")
  }

  test("compaction racing a writer never loses or duplicates rows") {
    val root = Files.createTempDirectory("graft-race-c").toString
    val goFile = s"$root/.go"
    // fragmented seed so compaction has real work racing the appends
    SnapshotTable.create(spark, root,
      (100L until 140L).map(i => (i, s"seed$i")).toDF("id", "v").repartition(8),
      statsKey = Some("id"))
    val ps = Seq(launch(root, goFile, 1, OpsPerWriter, "append"),
      launch(root, goFile, 2, 3, "compact"))
    Files.createFile(Paths.get(goFile))
    await(root, ps)

    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (1 to (1 + OpsPerWriter + 3)), s"versions must be contiguous, got $vs")
    val rows = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (100L until 140L).map(i => i -> s"seed$i").toSet ++
      (0 until OpsPerWriter).map(i => (1000L + i) -> s"w1-a$i").toSet
    assert(rows == expected,
      "compaction must preserve every row while a writer appends concurrently")
    // every version (including mid-race compactions) stays readable
    vs.foreach { v =>
      assert(SnapshotTable.read(spark, root, Some(v)).count() >= 40L,
        s"version $v lost rows")
    }
  }

  test("maintain racing a writer: row set preserved, versions contiguous, counts consistent") {
    val root = Files.createTempDirectory("graft-race-m").toString
    val goFile = s"$root/.go"
    // fragmented seed + pre-seeded dv debt, so the racing maintain has
    // BOTH shapes of real work (materializeDv and compactSmall)
    SnapshotTable.create(spark, root,
      (100L until 140L).map(i => (i, s"seed$i")).toDF("id", "v").repartition(8),
      statsKey = Some("id"))
    SnapshotTable.deleteWhere(spark, root, col("id") < 110)
    val ps = Seq(launch(root, goFile, 1, OpsPerWriter, "append"),
      launch(root, goFile, 2, 3, "maintain"))
    Files.createFile(Paths.get(goFile))
    await(root, ps)

    // expire ran mid-race, so versions need not start at 1 — but the
    // surviving window must be contiguous and fully parseable
    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (vs.head to vs.last), s"versions must be contiguous, got $vs")
    val rows = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (110L until 140L).map(i => i -> s"seed$i").toSet ++
      (0 until OpsPerWriter).map(i => (1000L + i) -> s"w1-a$i").toSet
    assert(rows == expected,
      "maintenance must preserve every live row (and resurrect none) under a racing writer")
    // the deleted rows stayed deleted through every materialize/pack
    assert(SnapshotTable.read(spark, root).filter(col("id") < 110).count() == 0)
    // the manifest's recorded counts survived the race consistent
    assert(SnapshotTable.describeDetail(spark, root).nRows == expected.size.toLong)
  }

  test("maintain racing a LIVE streaming sink: exactly-once survives the interleave") {
    val root = Files.createTempDirectory("graft-race-s").toString
    val goFile = s"$root/.go"
    // fragmented seed + dv debt: the racing maintain has real work
    // (materializeDv + compactSmall + expire + vacuum) while the sink
    // commits micro-batches through the SAME optimistic protocol
    SnapshotTable.create(spark, root,
      (100L until 140L).map(i => (i, s"seed$i")).toDF("id", "v").repartition(8),
      statsKey = Some("id"))
    SnapshotTable.deleteWhere(spark, root, col("id") < 110)
    val sinkRounds = 4
    val ps = Seq(launch(root, goFile, 1, sinkRounds, "sink"),
      launch(root, goFile, 2, 3, "maintain"))
    Files.createFile(Paths.get(goFile))
    await(root, ps)

    // every staged row landed exactly once; deleted rows stayed deleted
    val staged = (for { i <- 0 until sinkRounds; j <- 0 until 5 }
      yield (2000L + 10L * i + j) -> s"w1-s$i-$j").toSet
    val expected = (110L until 140L).map(i => i -> s"seed$i").toSet ++ staged
    def tableRows(): Set[(Long, String)] = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tableRows() == expected,
      "sink batches must land exactly once under a racing maintain")
    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (vs.head to vs.last), s"versions must be contiguous, got $vs")
    assert(SnapshotTable.describeDetail(spark, root).nRows == expected.size.toLong)

    // SAME checkpoint, no new data: a restarted stream delivers nothing
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = false)))
    def drain(ckpt: String): Unit =
      spark.readStream.schema(sch).parquet(s"$root/_stage")
        .writeStream.format("graft-table")
        .option("path", root).option("checkpointLocation", ckpt)
        .option("statsKey", "id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    drain(s"$root/_ckpt")
    assert(tableRows() == expected, "a caught-up restart must deliver nothing")

    // one more staged round with no maintain racing: the table's
    // NEWEST version now provably carries the sink's txn marker (the
    // racing maintain could legitimately have expired older markers —
    // retention must outlive the replay window, same contract as the
    // source side)
    val extra = (0 until 5).map(j => (2000L + 10L * sinkRounds + j,
      s"w1-s$sinkRounds-$j"))
    extra.toDF("id", "v").coalesce(1).write.mode("append").parquet(s"$root/_stage")
    drain(s"$root/_ckpt")
    val expected2 = expected ++ extra.toSet
    assert(tableRows() == expected2)

    // FRESH checkpoint (the lost-checkpoint disaster): the file source
    // replays EVERY staged batch from scratch; the replay's batch ids
    // restart at 0, at or below the surviving marker, so the sink's
    // txnBatchId cursor drops every one — no double-delivery
    drain(s"$root/_ckpt_replay")
    assert(tableRows() == expected2,
      "a replay from a fresh checkpoint must be dropped by the txn cursor")
  }

  test("read-retention contract: expire+vacuum under a pinned reader fails LOUDLY, never partially") {
    val root = Files.createTempDirectory("graft-race-r").toString
    SnapshotTable.create(spark, root,
      (0L until 100L).map(i => (i, s"v1-$i")).toDF("id", "v").repartition(2),
      statsKey = Some("id"))
    // compaction rewrites every file, so v1's files belong ONLY to v1
    SnapshotTable.compact(spark, root, targetFiles = 2)
    // the reader PINS v1's exact file list at DataFrame construction
    val pinned = SnapshotTable.read(spark, root, Some(1))
    assert(pinned.count() == 100, "pre-expiry the pinned version reads fully")
    SnapshotTable.expireVersions(spark, root, keepLast = 1)
    SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    // the still-held reader must now FAIL with a missing-file error —
    // the pinned file list is what makes silent partial data impossible
    val e = intercept[Exception] { pinned.count() }
    def mentionsMissingFile(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("does not exist") || m.contains("FileNotFound")) ||
        mentionsMissingFile(t.getCause))
    assert(mentionsMissingFile(e),
      s"a vacuumed-under read must surface the missing file, got $e")
    // re-resolving the expired version fails the version check up front
    intercept[IllegalArgumentException] { SnapshotTable.read(spark, root, Some(1)) }
    // the retained latest version is untouched by the cleanup
    assert(SnapshotTable.read(spark, root).count() == 100)
  }
}
