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
  * here; the query runner (Verify / Bench / a user's job driver) calls
  * [[drain]] once the action consuming the returned frame has finished.
  * Draining is idempotent and safe while other queries build plans —
  * unpersist on an already-unpersisted frame is a no-op, and Spark
  * recomputes evicted blocks if a stale plan re-executes.
  */
object CacheScope {
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
}
