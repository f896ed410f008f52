package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only census of the ACTION COUNT behind each gate (not part of
  * the driver contract). PLANS.md's action-floor analysis says every
  * Spark action on this box pays ~0.1 s of dispatch floor regardless
  * of data size, so a lifecycle gate's bench cost is essentially
  * `#jobs × 0.1 s` — this main makes that number an artifact instead
  * of a guess, so cuts target the gates with the most dispatches.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ActionCount g1,g2,..."
  * (no args = the full board). Prints one line per gate:
  * `name  jobs=<n>  sec=<t>` sorted by job count, plus a total.
  */
object ActionCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same deployment recipe as Bench/Verify so the census measures
      // the surfaces the driver actually runs
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def flush(): Unit =
      org.apache.spark.sql.graftbridge.Bridge.flushListenerBus(spark)
    val scope = new CacheScope
    val rows = CacheScope.withScope(scope) { Scratch.scopedCleanup {
      SparkEntry.queries.toSeq
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
          // one warm-up materialization (codegen) so the counted run
          // reflects steady state like Bench's timed runs do
          try { fn(spark, sfDir).count(); () }
          catch { case scala.util.control.NonFatal(e) =>
            Console.err.println(s"[actioncount] $name warm-up failed: $e")
          }
          finally { scope.drain(); Scratch.drainCleanup(); () }
          // JobStart events deliver asynchronously — drain the bus on
          // both sides of the counted window or the warm-up's stragglers
          // inflate it (and the run's tail jobs go missing)
          flush(); jobs.set(0)
          val t0 = System.nanoTime()
          val (n, sec) =
            try {
              fn(spark, sfDir).count()
              // timing excludes the drains below, like Bench's runs
              val dt = (System.nanoTime() - t0) / 1e9
              flush()
              (jobs.get(), dt)
            }
            catch { case scala.util.control.NonFatal(e) =>
              Console.err.println(s"[actioncount] $name failed: $e")
              (-1, (System.nanoTime() - t0) / 1e9)
            }
            finally { scope.drain(); Scratch.drainCleanup(); () }
          (name, n, sec)
        }
    } }
    rows.sortBy(-_._2).foreach { case (name, n, sec) =>
      println(f"$name%-34s jobs=$n%4d  sec=$sec%7.2f")
    }
    println(f"TOTAL jobs=${rows.map(_._2).filter(_ > 0).sum}%d " +
      f"sec=${rows.map(_._3).sum}%.1f over ${rows.size}%d gates")
    spark.stop()
  }
}
