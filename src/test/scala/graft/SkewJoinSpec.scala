package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling (SURVEY.md "skewed keys → salting or AQE
  * skew-join"): with thresholds scaled to test data, AQE detects the
  * hot key's oversized shuffle partition and splits it — the runtime
  * complement to the explicit Salting utility. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k rows, 90% on one key; right side 1k distinct keys
      val big = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
      val small = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(small, Seq("k"))
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      val n = joined.collect().length // execute THIS QueryExecution so AQE finalizes
      assert(n == 200000)
      val planStr = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(planStr.contains("skew=true"),
        s"expected AQE skew-split marker in plan:\n${planStr.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
