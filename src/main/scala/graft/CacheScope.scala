package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for operator-internal persisted frames.
  *
  * Several operators persist/cache corpus-sized intermediates that fan
  * out to multiple consumers (the dedup gram stream, the MinHash
  * candidate spine, the IVF training frame, ...). The persist is the
  * right plan — but the DataFrame is returned lazily, so the operator
  * itself has no "after the consuming action" point at which to
  * unpersist. In a long-lived session (a notebook, a streaming driver,
  * the Bench loop over 100+ queries) those blocks would otherwise
  * accumulate in the storage layer indefinitely.
  *
  * Contract: an operator that persists an internal frame REGISTERS it
  * via the companion's [[CacheScope.register]]; the query runner
  * (Verify / Bench / a user's job driver) calls [[CacheScope.drain]]
  * once the action consuming the returned frame has finished. Draining
  * is idempotent and safe while other queries build plans — unpersist
  * on an already-unpersisted frame is a no-op, and Spark recomputes
  * evicted blocks if a stale plan re-executes.
  *
  * SCOPING: registration lands in the CURRENT scope — a per-runner
  * instance installed with [[CacheScope.withScope]], falling back to a
  * shared default. Two runners in one JVM (parallel notebook cells, a
  * multi-tenant driver) each install their own scope on their thread,
  * so one runner's drain can no longer evict intermediates a
  * concurrent query is still consuming (previously correct-but-slow:
  * Spark recomputed the evicted blocks). The thread-local is
  * inheritable, so Spark action threads spawned by a runner register
  * into the runner's scope.
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def register(df: DataFrame): DataFrame = synchronized {
    frames += df
    df
  }

  /** Unpersist every registered frame (non-blocking) and clear the
    * registry. Returns how many frames were released. */
  def drain(): Int = synchronized {
    val n = frames.size
    frames.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () } // session may already be stopped
    }
    frames.clear()
    n
  }

  /** How many frames are currently registered (test/diagnostic). */
  def size: Int = synchronized(frames.size)
}

object CacheScope {
  private val default = new CacheScope
  private val current = new InheritableThreadLocal[CacheScope] {
    override def initialValue(): CacheScope = default
  }

  /** The calling thread's current scope — for handing to a worker
    * thread via [[withScope]]. Pool threads are created once and
    * reused, so the inheritable thread-local alone pins whatever scope
    * was live at pool-thread BIRTH, not the submitter's. */
  def currentScope: CacheScope = current.get

  /** Register into the calling thread's current scope. */
  def register(df: DataFrame): DataFrame = current.get.register(df)

  /** Drain the calling thread's current scope. */
  def drain(): Int = current.get.drain()

  /** Run `body` with `scope` installed as the current scope on this
    * thread (and threads it spawns); restores the previous scope on
    * exit. Frames the body registers belong to `scope` alone. */
  def withScope[T](scope: CacheScope)(body: => T): T = {
    val prev = current.get
    current.set(scope)
    try body finally current.set(prev)
  }
}
