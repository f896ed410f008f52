package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join scale strategy (SURVEY.md §2.3:
  * "bucketing for co-located joins"). Writing both fact tables
  * bucketed by the join key lets the join run with ZERO shuffle
  * exchanges — at 100 TB that's the difference between moving
  * terabytes and moving nothing. */
class BucketingSpec extends SparkSpec {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  test("bucketed orders⋈lineitem join plans without shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      joined.count()
      val shuffles = collectNodes(joined.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 0,
        s"bucketed join should not shuffle, found $shuffles exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dynamic partition pruning: a dim-filtered join reads only surviving partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val tmp = java.nio.file.Files.createTempDirectory("graft-dppspec").toString
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$tmp/fact")
    docs.select(col("lang")).distinct()
      .withColumn("tier", when(col("lang") === "en", lit("keep")).otherwise(lit("drop")))
      .write.mode("overwrite").parquet(s"$tmp/dim")
    // the filter is on the dim ATTRIBUTE — the surviving partition
    // values are only known at runtime, so static pruning can't help
    val q = spark.read.parquet(s"$tmp/fact")
      .join(broadcast(spark.read.parquet(s"$tmp/dim").filter(col("tier") === "keep")), "lang")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    // execute THIS QueryExecution (an action like .count() plans a
    // separate derived query and leaves q's scan metrics untouched)
    q.collect()
    def nodesQ(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodesQ(a.executedPlan)
      case qs: QueryStageExec => qs +: nodesQ(qs.plan)
      case other => other +: other.children.flatMap(nodesQ)
    }
    val scan = nodesQ(q.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("fact")) => f
    }.getOrElse(fail("no fact scan in the executed plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"expected a dynamicpruning subquery, got ${scan.partitionFilters}")
    assert(scan.metrics("numFiles").value < scan.metrics("staticFilesNum").value,
      s"runtime file count must undercut the static table: ${scan.metrics}")
    assert(scan.metrics("numPartitions").value == 1,
      "only the 'en' partition survives the dim filter")
    graft.Scratch.registerForCleanup(tmp)
  }
}
