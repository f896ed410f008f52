package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** foreachBatch upsert sink (SURVEY.md §2.12: the reference's
  * delete-then-add J2 as a streaming sink): each micro-batch MERGEs
  * into a parquet table keyed on (user_id, event_type) keeping the
  * latest event — the idempotent upsert loop the reference runs
  * per-document, driven by checkpointed streaming batches.
  *
  * The fixture splits events.parquet into several files and streams
  * with maxFilesPerTrigger=1, so keys arrive across MULTIPLE
  * micro-batches with non-monotonic timestamps — the merge must
  * resolve incoming vs current state per composite key, not
  * last-batch-wins.
  */
class ForeachBatchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming foreachBatch upsert converges to the batch last-per-key table") {
    val tmp = Files.createTempDirectory("graft-fb")
    val srcDir = s"$tmp/src"
    val target = s"$tmp/state"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // split the single events file into 3 so maxFilesPerTrigger=1 yields
    // 3 micro-batches with keys interleaved across them
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.repartition(3).write.mode(SaveMode.Overwrite).parquet(srcDir)
    val schema = raw.schema
    val keys = Seq("user_id", "event_type")

    def upsertBatch(batch: DataFrame, id: Long): Unit = {
      val latest = batch
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.ts").as("ts"), col("m.event_id").as("event_id"))
      val existing =
        try spark.read.parquet(target)
        catch { case _: Throwable => spark.emptyDataFrame }
      val merged =
        if (existing.columns.isEmpty) latest
        else {
          // resolve incoming vs current state for the touched keys, then
          // delete-then-add (J2) on the composite key
          val touched = existing.join(
            latest.select(col("user_id"), col("event_type")).distinct(),
            keys, "left_semi")
          val resolved = touched.unionByName(latest)
            .groupBy(col("user_id"), col("event_type"))
            .agg(max(struct(col("ts"), col("event_id"))).as("m"))
            .select(col("user_id"), col("event_type"),
              col("m.ts").as("ts"), col("m.event_id").as("event_id"))
          meta.Upsert.upsert(existing, resolved, keys)
        }
      // write to temp then swap would be the production move; locally a
      // cached overwrite suffices
      val snapshot = merged.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(snapshot.toIndexedSeq), merged.schema)
        .write.mode(SaveMode.Overwrite).parquet(target)
    }

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      // epoch-micros long whatever the generator's encoding (ns-long or
      // µs timestamp) — the same dispatch Tables.normalizeEventTs makes
      .withColumn("ts", raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => unix_micros(col("ts").cast("timestamp"))
      })
      .writeStream
      .foreachBatch(upsertBatch _)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.read.parquet(target)
      .orderBy("user_id", "event_type")
      .as[(Long, String, Long, Long)].collect().toSeq
    val want = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(unix_micros(col("ts")).as("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts").as("ts"), col("m.event_id").as("event_id"))
      .orderBy("user_id", "event_type")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == want)
  }
}
