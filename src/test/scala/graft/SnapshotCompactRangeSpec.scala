package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** [[graft.sources.SnapshotTable.compactRange]]: surgical selection by
  * recorded stats, carry-by-name outside the range, content
  * preservation, dv materialization inside the range, the ≤1-file
  * no-op, and the missing-statsKey refusal. */
class SnapshotCompactRangeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("crspec").toString

  private def files(root: String): Set[String] =
    SnapshotTable.read(spark, root).inputFiles.filter(_.contains("/data/")).toSet

  test("only intersecting files rewrite; others carry by name; rows survive") {
    val root = tmp()
    val df = (0L until 400L).map(i => (i, s"v$i")).toDF("k", "s")
    SnapshotTable.create(spark, root,
      df.repartitionByRange(8, col("k")), statsKey = Some("k"))
    val before = files(root)
    assert(before.size == 8)
    SnapshotTable.deleteWhere(spark, root, col("k") < 100L && col("k") % 10 === 0L)
    val v = SnapshotTable.compactRange(spark, root, 0L, 99L, targetFiles = 1)
    assert(v.isDefined)
    val after = files(root)
    val carried = before.intersect(after)
    // 8 files over [0,400): [0,99] hits 2 of them; 6 carry by name
    assert(carried.size == 6 && after.diff(before).size == 1)
    // the range's dv debt materialized; content is the post-delete set
    val det = SnapshotTable.describeDetail(spark, root)
    assert(det.dvFiles == 0 && det.dvRows == 0L)
    val got = SnapshotTable.read(spark, root).select(col("k"))
      .as[Long].collect().toSet
    assert(got == (0L until 400L).filterNot(i => i < 100 && i % 10 == 0).toSet)
    // row-preserving: CDC silent over the compact
    assert(SnapshotTable.readChanges(spark, root, v.get - 1, v).isEmpty)
    Scratch.deleteRecursively(root)
  }

  test("a range covered by one file is a committed-nothing no-op") {
    val root = tmp()
    val df = (0L until 100L).map(i => (i, i)).toDF("k", "x")
    SnapshotTable.create(spark, root,
      df.repartitionByRange(4, col("k")), statsKey = Some("k"))
    val versions = SnapshotTable.versions(spark, root)
    assert(SnapshotTable.compactRange(spark, root, 0L, 5L).isEmpty)
    assert(SnapshotTable.versions(spark, root) == versions)
    Scratch.deleteRecursively(root)
  }

  test("refused without a recorded statsKey") {
    val root = tmp()
    SnapshotTable.create(spark, root, Seq((1L, 2L)).toDF("k", "x"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compactRange(spark, root, 0L, 10L)
    }
    assert(e.getMessage.contains("statsKey"))
    Scratch.deleteRecursively(root)
  }
}
