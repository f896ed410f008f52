package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** foreachBatch upsert sink (SURVEY.md §2.12: the reference's
  * delete-then-add J2 as a streaming sink): each micro-batch MERGEs
  * into a parquet table keyed on (user_id, event_type) keeping the
  * latest event — the idempotent upsert loop the reference runs
  * per-document, driven by checkpointed streaming batches. */
class ForeachBatchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming foreachBatch upsert converges to the batch last-per-key table") {
    val target = s"${Files.createTempDirectory("graft-fb")}/state"
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

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
        else meta.Upsert.upsert(existing, latest, "user_id")
          .groupBy(col("user_id"), col("event_type"))
          .agg(max(struct(col("ts"), col("event_id"))).as("m"))
          .select(col("user_id"), col("event_type"),
            col("m.ts").as("ts"), col("m.event_id").as("event_id"))
      // write to temp then swap would be the production move; locally a
      // cached overwrite suffices
      val snapshot = merged.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(snapshot.toIndexedSeq), merged.schema)
        .write.mode(SaveMode.Overwrite).parquet(target)
    }

    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(sf)
      .withColumn("ts", expr("ts div 1000")) // ns -> us like Tables.events
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
