package graft

import org.apache.spark.sql.functions._
import graft.meta.IncrementalView
import graft.sources.SnapshotTable

/** [[graft.meta.IncrementalView]]: counting-IVM correctness against a
  * full recompute at every step, cursor/replay semantics, tombstone
  * lifecycle, and the float-measure refusal. */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ivspec").toString

  private def recompute(tbl: String) =
    SnapshotTable.read(spark, tbl).groupBy(col("g"))
      .agg(count(lit(1)).as("view_cnt"), sum(col("x")).as("view_sum"))

  private def assertCurrent(tbl: String, vw: String): Unit = {
    val v = IncrementalView.read(spark, vw)
    val r = recompute(tbl)
    assert(v.exceptAll(r).isEmpty && r.exceptAll(v).isEmpty,
      s"maintained state diverged:\nview=${v.collect().toSeq.sortBy(_.getLong(0))}" +
        s"\nfull=${r.collect().toSeq.sortBy(_.getLong(0))}")
  }

  test("refresh after append, merge, and delete matches full recompute") {
    val root = tmp(); val tbl = s"$root/t"; val vw = s"$root/v"
    val base = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
      (4L, 20L, 400L), (5L, 30L, 500L)).toDF("k", "g", "x")
    SnapshotTable.create(spark, tbl, base, statsKey = Some("k"))
    assert(IncrementalView.create(spark, tbl, vw, "g", "x") == 1)
    assertCurrent(tbl, vw)
    // append: new group 40 + growth of 10
    SnapshotTable.append(spark, tbl,
      Seq((6L, 40L, 600L), (7L, 10L, 700L)).toDF("k", "g", "x"))
    assert(IncrementalView.refresh(spark, tbl, vw) == 1)
    assertCurrent(tbl, vw)
    // merge: update k=3's measure (delete+insert pair nets to the change)
    SnapshotTable.merge(spark, tbl,
      Seq((3L, 20L, 999L)).toDF("k", "g", "x"), key = "k")
    assert(IncrementalView.refresh(spark, tbl, vw) == 1)
    assertCurrent(tbl, vw)
    // dv delete emptying group 30 entirely
    SnapshotTable.deleteWhere(spark, tbl, col("g") === 30L)
    assert(IncrementalView.refresh(spark, tbl, vw) == 1)
    assertCurrent(tbl, vw)
    // the emptied group is a tombstone: invisible to read, present raw
    assert(IncrementalView.read(spark, vw).filter(col("g") === 30L).isEmpty)
    assert(!SnapshotTable.read(spark, vw).filter(col("g") === 30L).isEmpty)
    IncrementalView.purgeTombstones(spark, vw)
    assert(SnapshotTable.read(spark, vw).filter(col("g") === 30L).isEmpty)
    assertCurrent(tbl, vw)
    Scratch.deleteRecursively(root)
  }

  test("replayed and batched refreshes: cursor rides the commit") {
    val root = tmp(); val tbl = s"$root/t"; val vw = s"$root/v"
    SnapshotTable.create(spark, tbl,
      Seq((1L, 1L, 1L)).toDF("k", "g", "x"), statsKey = Some("k"))
    IncrementalView.create(spark, tbl, vw, "g", "x")
    assert(IncrementalView.refresh(spark, tbl, vw) == 0) // already current
    SnapshotTable.append(spark, tbl, Seq((2L, 1L, 2L)).toDF("k", "g", "x"))
    SnapshotTable.append(spark, tbl, Seq((3L, 2L, 3L)).toDF("k", "g", "x"))
    assert(IncrementalView.refresh(spark, tbl, vw) == 2) // one 2-version window
    assert(IncrementalView.refresh(spark, tbl, vw) == 0) // replay is a no-op
    assert(SnapshotTable.lastTxnBatchId(spark, vw).contains(3L))
    assertCurrent(tbl, vw)
    // view maintenance between refreshes must not disturb the cursor
    SnapshotTable.compact(spark, vw, targetFiles = 1)
    assert(SnapshotTable.lastTxnBatchId(spark, vw).contains(3L))
    SnapshotTable.append(spark, tbl, Seq((4L, 2L, 4L)).toDF("k", "g", "x"))
    assert(IncrementalView.refresh(spark, tbl, vw) == 1)
    assertCurrent(tbl, vw)
    Scratch.deleteRecursively(root)
  }

  test("float measures are refused; wrong tableRoot is refused") {
    val root = tmp(); val tbl = s"$root/t"; val vw = s"$root/v"
    SnapshotTable.create(spark, tbl,
      Seq((1L, 1L, 1.5)).toDF("k", "g", "x"), statsKey = Some("k"))
    val e = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, tbl, vw, "g", "x")
    }
    assert(e.getMessage.contains("integral"))
    val tbl2 = s"$root/t2"; val vw2 = s"$root/v2"
    SnapshotTable.create(spark, tbl2,
      Seq((1L, 1L, 1L)).toDF("k", "g", "x"), statsKey = Some("k"))
    IncrementalView.create(spark, tbl2, vw2, "g", "x")
    val e2 = intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, tbl, vw2)
    }
    assert(e2.getMessage.contains("tracks"))
    Scratch.deleteRecursively(root)
  }
}
