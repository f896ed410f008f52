package graft.geom

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

import graft.geom.RectMerge.Rect

/** A6 as a reusable typed Aggregator (SURVEY.md §2.13: "bbox component
  * merge → `Aggregator[Rect, Buf, Rect]`"): component-wise
  * min/min/max/max rect union (reference `rect_union`,
  * image_manager.py:64-80). Commutative + associative, so Spark can
  * partial-aggregate map-side before the shuffle — the UDAF form of
  * the per-group min/max aggregate used by `geom_page_union`.
  */
object RectUnionAgg extends Aggregator[Rect, Rect, Rect] {
  private val Empty = Rect(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)

  override def zero: Rect = Empty
  override def reduce(b: Rect, a: Rect): Rect = b.union(a)
  override def merge(b1: Rect, b2: Rect): Rect = b1.union(b2)
  override def finish(r: Rect): Rect = r
  override def bufferEncoder: Encoder[Rect] = Encoders.product[Rect]
  override def outputEncoder: Encoder[Rect] = Encoders.product[Rect]

  /** TypedColumn for `Dataset.agg`. */
  def column: TypedColumn[Rect, Rect] = RectUnionAgg.toColumn.name("rect_union")
}
