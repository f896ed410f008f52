package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** CROSS-PROCESS proof of the snapshot-table commit protocol.
  *
  * Two forked JVMs ([[graft.tools.RaceWriter]]) — separate processes,
  * separate Spark sessions, separate filesystem clients — race appends
  * and merges against one table root. Same-JVM tests (threads) cannot
  * prove the claim the protocol makes: on a local filesystem the only
  * thing serializing two PROCESSES is the atomicity of the publish
  * primitive itself (hard-link EEXIST). This spec asserts, over the
  * whole race:
  *  - exactly one winner per version: versions come out contiguous,
  *    every manifest fully parseable (no torn/zero-length manifests);
  *  - no lost updates: every writer's every operation is reflected —
  *    version count equals total ops, final rows are each writer's
  *    merged values exactly once;
  *  - losers retried onto later versions rather than clobbering
  *    (implied by contiguity + both exit codes 0 within the retry
  *    budget).
  */
class SnapshotRaceSpec extends SparkSpec {
  import spark.implicits._

  private val OpsPerWriter = 4

  test("two JVMs racing append+merge: one winner per version, no lost updates") {
    val root = Files.createTempDirectory("graft-race").toString
    val goFile = s"$root/.go"
    SnapshotTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"),
      statsKey = Some("id"))

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val classpath = System.getProperty("java.class.path")
    // forward the test JVM's --add-opens (Spark on JDK 17 needs them)
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val addOpens = inArgs.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" => Seq(a, inArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
    }.flatten

    def launch(wid: Int): Process = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1g", "-cp", classpath, "graft.tools.RaceWriter",
        root, wid.toString, OpsPerWriter.toString, goFile)).asJava
      new ProcessBuilder(cmd)
        .redirectOutput(new java.io.File(s"$root/writer$wid.out"))
        .redirectErrorStream(true)
        .start()
    }
    val w1 = launch(1)
    val w2 = launch(2)
    try {
      Files.createFile(Paths.get(goFile)) // both sessions up enough to spin; go
      assert(w1.waitFor(300, TimeUnit.SECONDS) && w2.waitFor(300, TimeUnit.SECONDS),
        "racing writers must finish within the window")
      def diag(wid: Int): String =
        try new String(Files.readAllBytes(Paths.get(s"$root/writer$wid.out")), "UTF-8").takeRight(800)
        catch { case _: Exception => "<no output>" }
      assert(w1.exitValue() == 0, s"writer 1 failed:\n${diag(1)}")
      assert(w2.exitValue() == 0, s"writer 2 failed:\n${diag(2)}")
    } finally {
      w1.destroyForcibly(); w2.destroyForcibly()
    }

    // exactly one winner per version: contiguous, every manifest whole
    val totalOps = 1 + 2 * (2 * OpsPerWriter) // create + 2 writers × (n appends + n merges)
    val vs = SnapshotTable.versions(spark, root)
    assert(vs == (1 to totalOps), s"versions must be contiguous, got $vs")
    vs.foreach { v =>
      assert(SnapshotTable.read(spark, root, Some(v)).count() >= 1,
        s"manifest v$v must be fully readable")
    }
    // no lost updates: final state is each writer's merged rows, once
    val finalRows = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set(0L -> "seed") ++ (for {
      wid <- Seq(1L, 2L); i <- 0 until OpsPerWriter
    } yield (1000L * wid + i) -> s"w$wid-m$i")
    assert(finalRows == expected,
      s"every op must land exactly once; diff=${(finalRows diff expected) ++ (expected diff finalRows)}")
    // and no duplicate keys survived the concurrent merges
    val dupes = SnapshotTable.read(spark, root)
      .groupBy(col("id")).count().filter(col("count") > 1).count()
    assert(dupes == 0, "concurrent merges must not duplicate keys")
  }
}
