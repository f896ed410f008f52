package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.SnapshotTable

/** Subprocess helper for SnapshotRaceSpec: a REAL separate JVM (its own
  * SparkSession, its own filesystem client — no shared locks, no shared
  * JVM monitors) hammering the table another process is writing
  * concurrently. This is the only honest way to exercise the commit
  * protocol's cross-process claim: local filesystems give
  * `create(overwrite=false)` no atomicity across processes unless the
  * primitive itself is atomic (link(2) here), and a same-JVM test can
  * never distinguish the two.
  *
  * args: tableRoot writerId nOps goFile mode
  *  - mode "mix": n appends (keys 1000*writerId + i), then n merges of
  *    those same keys (delete-then-add racing the other writer's file
  *    rewrites), then n CONTESTED merges of shared key 0 — both
  *    processes rewriting the same key, so serializability (exactly
  *    one surviving row) is what the commit order must guarantee;
  *  - mode "append": n appends only (clean row-set expectation);
  *  - mode "compact": n full-table compactions — maintenance racing a
  *    concurrent writer, the classic copy-on-write conflict shape;
  *  - mode "sink": n STREAMING micro-batch rounds through the
  *    transactional `graft-table` sink — each round stages a
  *    deterministic parquet batch under `<root>/_stage` and drains it
  *    with an AvailableNow file-stream into the table against the
  *    FIXED checkpoint `<root>/_ckpt` (both dirs outside vacuum's
  *    sweep), so a concurrently-maintaining process interleaves with
  *    real exactly-once sink commits, checkpoint advance included.
  * Spins on `goFile` after session startup so both processes enter the
  * commit loop together.
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, writerIdStr, nStr, goFile, mode) = args
    val wid = writerIdStr.toLong
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$wid")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val deadline = System.currentTimeMillis() + 120000L
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile))) {
      if (System.currentTimeMillis() > deadline) sys.exit(3)
      Thread.sleep(10)
    }
    mode match {
      case "append" =>
        (0 until n).foreach { i =>
          SnapshotTable.append(spark, root,
            Seq((1000L * wid + i, s"w$wid-a$i")).toDF("id", "v"), statsKey = Some("id"))
        }
      case "compact" =>
        (0 until n).foreach { _ =>
          SnapshotTable.compact(spark, root, targetFiles = 2, statsKey = Some("id"))
        }
      case "maintain" =>
        // the full incremental cycle racing a writer: materializeDv +
        // compactSmall + expire + vacuum (default 1h age floor — the
        // multi-writer-safe retention, NOT the streaming loops' 0)
        (0 until n).foreach { _ =>
          SnapshotTable.maintain(spark, root, smallBytes = 1L << 20,
            keepVersions = 4, statsKey = Some("id"))
        }
      case "sink" =>
        val stage = s"$root/_stage"
        val sch = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType, nullable = false)))
        (0 until n).foreach { i =>
          (0 until 5).map(j => (2000L * wid + 10L * i + j, s"w$wid-s$i-$j"))
            .toDF("id", "v").coalesce(1)
            .write.mode("append").parquet(stage)
          spark.readStream.schema(sch).parquet(stage)
            .writeStream.format("graft-table")
            .option("path", root)
            .option("checkpointLocation", s"$root/_ckpt")
            .option("statsKey", "id")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start().awaitTermination()
        }
      case "mix" =>
        (0 until n).foreach { i =>
          SnapshotTable.append(spark, root,
            Seq((1000L * wid + i, s"w$wid-a$i")).toDF("id", "v"), statsKey = Some("id"))
        }
        (0 until n).foreach { i =>
          SnapshotTable.merge(spark, root,
            Seq((1000L * wid + i, s"w$wid-m$i")).toDF("id", "v"), key = "id")
        }
        (0 until n).foreach { i =>
          SnapshotTable.merge(spark, root,
            Seq((0L, s"w$wid-c$i")).toDF("id", "v"), key = "id")
        }
    }
    spark.stop()
  }
}
