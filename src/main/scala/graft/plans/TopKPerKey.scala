package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §2.13, preference ladder (c)):
  * top-k rows per key as a FIRST-CLASS physical operator instead of
  * the `row_number().over(partitionBy(...).orderBy(...)) <= k` window
  * plan.
  *
  * Why a custom operator: the window formulation SORTS every group's
  * full row set (shuffle + per-partition sort of ALL rows) only to
  * discard all but k. This operator keeps a bounded heap of k rows per
  * key on the MAP side, shuffles at most k rows per (key, partition),
  * and merges heaps on the reduce side — the same partial/final shape
  * as hash aggregation, with memory bounded by (#keys-in-partition)·k
  * rows instead of a full sort buffer. At 100 TB with hot keys this is
  * the difference between a skew-prone full sort and a scan.
  *
  * Planning: [[TopKPerKeyStrategy]] rewrites the logical node into
  * partial → (exchange inserted by EnsureRequirements via
  * requiredChildDistribution) → final. Registered either through
  * `spark.experimental.extraStrategies` ([[TopKPerGroup.topK]] does it
  * idempotently) or `injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]).
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

private[plans] object TopKRoutine {
  /** Bounded per-key top-k over one partition: heap head is the WORST
    * retained row, replaced when a better row arrives. Emits each
    * key's survivors in sort order (deterministic output). */
  def topKIter(iter: Iterator[InternalRow], keys: Seq[Expression],
      order: Seq[SortOrder], k: Int, attrs: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, attrs)
    val ord: Ordering[InternalRow] = GenerateOrdering.generate(order, attrs)
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var q = heaps.get(key)
      if (q == null) {
        q = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
        heaps.put(key.copy(), q)
      }
      if (q.size < k) q.add(row.copy())
      else if (ord.lt(row, q.peek())) { q.poll(); q.add(row.copy()) }
    }
    heaps.values.iterator.asScala.flatMap { q =>
      val arr = q.toArray(new Array[InternalRow](q.size))
      java.util.Arrays.sort(arr, ord)
      arr.iterator
    }
  }
}

/** Map-side pruning: at most k rows per (key, partition) survive. */
final case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKRoutine.topKIter(_, keys, order, k, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side merge: requires clustering on the keys (the planner
  * inserts the hash exchange), then the same bounded routine yields
  * the exact global top-k per key. */
final case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKRoutine.topKIter(_, keys, order, k, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
