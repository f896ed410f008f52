package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** At-scale upsert: dynamic partition overwrite — reprocessing one
  * document rewrites ONLY its bucket partition, not the table
  * (SURVEY.md §7.5 "all upserts partition-pruned MERGE patterns").
  * This is the parquet-native equivalent of the reference's
  * delete-then-add (J2) that stays O(changed partitions) at 100 TB. */
class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite rewrites only the touched bucket") {
    val dir = Files.createTempDirectory("graft-dpo").toString
    // scoped + restored: leaking dynamic mode changes which WRITE PATH
    // later suites' INSERT OVERWRITEs take (found the hard way — the
    // declared-bucketing test's overwrite silently went through the
    // executor batch writer and dissolved its layout)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
    val idx = Pipeline.buildIndex(spark, sf)
      .withColumn("bucket", col("metadata.doc_id") % 8)
    idx.write.partitionBy("bucket").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeCount = before.count()
    val untouched = before.filter(col("bucket") === 1)
      .select(input_file_name()).distinct().as[String].collect().toSet

    // reprocess doc 16 (bucket 0): delete-then-add within its partition
    val updated = idx.filter(col("bucket") === 0)
      .withColumn("text", when(col("metadata.doc_id") === 16,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    updated.write.partitionBy("bucket").mode("overwrite").parquet(dir)

    val after = spark.read.parquet(dir)
    assert(after.count() == beforeCount)
    assert(after.filter(col("metadata.doc_id") === 16)
      .select("text").as[String].collect().forall(_.endsWith(" v2")))
    // bucket 1's files untouched — only bucket 0 was rewritten
    val untouchedAfter = after.filter(col("bucket") === 1)
      .select(input_file_name()).distinct().as[String].collect().toSet
    assert(untouchedAfter == untouched)
    } finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", prevMode)
  }
}
