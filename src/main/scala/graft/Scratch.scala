package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Scratch-directory lifecycle for queries that exercise a WRITE
  * lifecycle (snapshot-table create/merge/compact, file re-ingestion)
  * and therefore need a corpus-sized temp directory that outlives no
  * single action. Returning a lazy frame rooted in the scratch dir
  * forces the dir to live as long as any consumer might re-execute the
  * plan — in a benched loop (fingerprint + warm-up + timed runs) that
  * meant a fresh corpus-sized table leaked to /tmp per invocation,
  * unbounded disk growth in any long-lived session.
  *
  * [[localizeAndDelete]] closes the lifecycle: the query's RESULT is
  * always driver-bounded (top-k rankings, per-doc scalars — the gate
  * contract), so materialize it into a local relation, delete the
  * scratch roots, and hand back a frame with no tie to the deleted
  * paths. Re-execution replays a LocalTableScan, not the lifecycle —
  * which also makes the query's plan fingerprint independent of the
  * scratch paths embedded in file-scan plans.
  */
object Scratch {

  /** Hard cap on rows a "bounded result" may collect — a guard against
    * accidentally localizing a corpus-sized frame, not a tunable. */
  private val MaxLocalRows = 200000

  def deleteRecursively(root: String): Unit = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally s.close()
  }

  /** Collect `df` (must be bounded — top-k rankings and the like; the
    * cap is a guard, not a tunable), delete `roots`, return the rows as
    * a local in-memory frame with the same schema and row order. For
    * corpus-sized results use [[registerForCleanup]] instead: the
    * output of a per-doc lifecycle query grows with the corpus and
    * must stay distributed. */
  def localizeAndDelete(spark: SparkSession, df: DataFrame, roots: Seq[String]): DataFrame = {
    val rows: Array[Row] = df.collect()
    require(rows.length <= MaxLocalRows,
      s"localizeAndDelete is for bounded results; got ${rows.length} rows")
    roots.foreach(deleteRecursively)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Deferred deletion for scratch roots a RETURNED frame still reads:
    * the runner (Verify / Bench / a job driver) calls [[drainCleanup]]
    * once the action consuming the frame has finished — the path
    * analog of [[CacheScope]], and scoped the same way (thread-local
    * registry, inheritable) so concurrent runners can't delete each
    * other's in-flight scratch. */
  def registerForCleanup(root: String): Unit = current.get.synchronized {
    current.get += root
  }

  /** Delete every registered scratch root of the calling thread's
    * scope. Returns how many roots were removed. */
  def drainCleanup(): Int = {
    val reg = current.get
    reg.synchronized {
      val n = reg.size
      reg.foreach(deleteRecursively)
      reg.clear()
      n
    }
  }

  private val defaultRegistry = scala.collection.mutable.ArrayBuffer.empty[String]
  private val current =
    new InheritableThreadLocal[scala.collection.mutable.ArrayBuffer[String]] {
      override def initialValue(): scala.collection.mutable.ArrayBuffer[String] = defaultRegistry
    }

  /** The calling thread's cleanup registry — for handing to a worker
    * thread via [[withRegistry]] (same pool-thread-reuse caveat as
    * [[CacheScope.currentScope]]). */
  private[graft] def currentRegistry: scala.collection.mutable.ArrayBuffer[String] =
    current.get

  /** Run `body` with `reg` installed as this thread's cleanup registry;
    * restores the previous one on exit. Unlike [[scopedCleanup]] this
    * does NOT drain — ownership stays with the registry's home thread. */
  private[graft] def withRegistry[T](reg: scala.collection.mutable.ArrayBuffer[String])(body: => T): T = {
    val prev = current.get
    current.set(reg)
    try body finally current.set(prev)
  }

  /** Run `body` with a fresh cleanup scope on this thread. */
  def scopedCleanup[T](body: => T): T = {
    val prev = current.get
    current.set(scala.collection.mutable.ArrayBuffer.empty[String])
    try body finally { drainCleanup(); current.set(prev) }
  }
}
