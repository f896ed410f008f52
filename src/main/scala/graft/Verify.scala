package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-JVM harness, no speculative execution: direct task
      // commit (committer v2) halves each tiny table-commit's rename
      // bill. Cluster deployments choose their own committer (cloud
      // object stores use a manifest committer anyway) — this is the
      // harness session's deployment recipe, set once at the root so
      // every probe session inherits it via the shared context.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-only subset filter (comma-separated names); the driver never
    // sets it, so the contract surface is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    dump(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** The dump body, callable from a running session (the dtype-sweep
    * spec drives it through `sbt test` so the dtype-strict oracle
    * compare guards the whole board in CI, not just at round close).
    * Returns the names that FAILED to produce output. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]] = None): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // this runner's own cache + scratch scopes: drains between queries
    // can't touch frames or scratch roots a concurrent runner in the
    // same JVM has registered
    val scope = new CacheScope
    CacheScope.withScope(scope) { Scratch.scopedCleanup {
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            failed += name
          }
          // release operator-internal persisted frames and scratch
          // roots between queries — a long runner must not accumulate
          // storage or /tmp trees across 100+ plans
          finally { scope.drain(); Scratch.drainCleanup(); () }
        }
    } }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed.toSeq
  }
}
