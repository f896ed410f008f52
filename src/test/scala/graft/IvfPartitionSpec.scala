package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.vector.{KMeans, VectorOps}

/** The IVF scale claim made executable: "at 100 TB the table is
  * partitioned by list id, so a query touches nprobe/nlist of the
  * data". Materialize the assignment as a list_id-partitioned parquet
  * table and prove that a probe's scan reads ONLY the probed
  * partitions — partition pruning, not a filtered full scan. */
class IvfPartitionSpec extends SparkSpec {
  import spark.implicits._

  test("IVF probe over a list-partitioned table prunes to nprobe partitions") {
    val dir = Files.createTempDirectory("graft-ivf").toString
    val nlist = 8
    val nprobe = 2
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .persist()
    val centroids = KMeans.fit(spark, emb, nlist, iters = 1)
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("list_id"), col("cv")))).as("centroid_arr"))
    // materialize the inverted file: one directory per list
    val assigned = emb.crossJoin(broadcast(centArr))
      .withColumn("scored", array_sort(transform(col("centroid_arr"),
        c => struct(round(VectorOps.l2Squared(col("v"), c.getField("cv")), 9).as("dist2"),
          c.getField("list_id").as("list_id")))))
      .select(col("vec_id"), col("v"),
        element_at(col("scored"), 1).getField("list_id").as("list_id"))
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(dir)

    // probe: the nprobe lists nearest to the query vector
    val probeLists = assigned.filter(col("vec_id") === 0)
      .crossJoin(broadcast(centArr))
      .select(explode(slice(transform(array_sort(transform(col("centroid_arr"),
        c => struct(round(VectorOps.l2Squared(col("v"), c.getField("cv")), 9).as("dist2"),
          c.getField("list_id").as("list_id")))),
        s => s.getField("list_id")), 1, nprobe)).as("list_id"))
      .as[Long].collect().toSeq
    assert(probeLists.size == nprobe)

    val scan = spark.read.parquet(dir).filter(col("list_id").isin(probeLists: _*))
    // pruning proof 1: the executed scan carries a partition filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected partition filters in:\n$plan")
    // pruning proof 2: only files under the probed list directories are read
    val files = scan.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => probeLists.exists(l => f.contains(s"list_id=$l"))),
      "scan read a file outside the probed partitions")
    // and the probed subset still contains the query vector itself
    assert(scan.filter(col("vec_id") === 0).count() == 1)
    emb.unpersist()
  }
}
