package graft.relational

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator — the
  * HEAVY-HITTERS piece of the sketch family (HLL++ cardinality and GK
  * percentiles are built-ins; frequent items Spark has none for). An
  * exact `GROUP BY value ORDER BY count` over a 100 TB column shuffles
  * every distinct value; this keeps at most `k − 1` counters per
  * partial, merges them associatively (Agarwal et al., "Mergeable
  * Summaries", PODS 2012), and guarantees on a stream of `n` items:
  *
  *   - no overcount:  `est(v) ≤ true(v)`;
  *   - bounded undercount:  `est(v) ≥ true(v) − n/k`;
  *   - COVERAGE: every value with `true(v) > n/k` is in the summary
  *     (its estimate stays positive under at most `n/k` decrements).
  *
  * Execution shape is the whole point at scale: Spark runs the
  * Aggregator as partial-per-partition reduce then a k-bounded merge —
  * the only thing crossing the wire is `k − 1` (value, count) pairs
  * per partition, never the value distribution. The merge subtracts
  * the k-th largest combined count and drops non-positives, which
  * preserves both bounds (it is the decrement step batched).
  *
  * The summary CONTENT beyond the guaranteed values is partition-order
  * dependent (like any MG merge tree), so consumers pin the CONTRACT —
  * bounds and coverage — not the candidate list; see
  * `agg_heavy_hitters`, which emits only the deterministic heavy set
  * with exact recomputed counts. */
final class HeavyHitters(k: Int)
    extends Aggregator[Long, HeavyHitters.Buf, HeavyHitters.Summary] {
  require(k >= 2, s"k must be ≥ 2, got $k")

  import HeavyHitters.{Buf, Summary}

  override def zero: Buf = Buf(Map.empty, 0L)

  override def reduce(b: Buf, v: Long): Buf = {
    val c = b.counts
    val nc =
      if (c.contains(v)) c.updated(v, c(v) + 1L)
      else if (c.size < k - 1) c.updated(v, 1L)
      // decrement-all: one shared "charge" against every tracked value
      // plus the arriving one — the step the n/k bound accounts
      else c.flatMap { case (x, n) => if (n > 1L) Some(x -> (n - 1L)) else None }
    Buf(nc, b.n + 1L)
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val sum = b2.counts.foldLeft(b1.counts) { case (acc, (v, n)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + n)
    }
    val trimmed =
      if (sum.size <= k - 1) sum
      else {
        // batched decrement: subtract the k-th largest count from all
        val pivot = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        sum.flatMap { case (v, n) =>
          if (n > pivot) Some(v -> (n - pivot)) else None
        }
      }
    Buf(trimmed, b1.n + b2.n)
  }

  override def finish(b: Buf): Summary =
    Summary(b.counts.toSeq.sortBy(_._1).map { case (v, n) =>
      HeavyHitters.Item(v, n) }, b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]

  def column: TypedColumn[Long, Summary] =
    toColumn.name(s"misra_gries_$k")
}

object HeavyHitters {
  final case class Item(value: Long, est: Long)
  final case class Buf(counts: Map[Long, Long], n: Long)
  /** Candidate items (each with its conservative estimate) + the
    * stream length the n/k bound is stated against. */
  final case class Summary(items: Seq[Item], n: Long)

  /** One-group sketch over a Long column: ≤ `k − 1` candidates and the
    * total count, in a single partial-then-merge aggregation. */
  def sketch(spark: SparkSession, values: Dataset[Long], k: Int): Summary = {
    values.select(new HeavyHitters(k).column).head()
  }
}
