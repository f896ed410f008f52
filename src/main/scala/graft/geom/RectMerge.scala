package graft.geom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A7: connected-rectangle merge fixpoint (reference:
  * image_manager.py:103-142 `merge_rects` — greedy union of
  * overlapping/touching rects, tolerance 40pt, until no merge occurs).
  *
  * The union-closure of a rect set is confluent (merging enlarges
  * rects, which can only create more overlaps, and rect-union is
  * associative/commutative), so the greedy fixpoint has a unique
  * result — we exploit that by sorting inputs for determinism and
  * testing permutation-invariance (see GeomSpec).
  *
  * Distribution: rects are grouped per (doc, page) and the per-group
  * fixpoint runs inside `flatMapGroups` — groups are tiny (figures on
  * one page) and independent, so the operator is embarrassingly
  * parallel with a single shuffle on the group key. A 100 TB variant
  * with huge groups would switch to iterative component-id propagation
  * joins (SURVEY.md §2.4 A7), which no test data here warrants.
  */
object RectMerge {

  final case class Rect(x0: Double, y0: Double, x1: Double, y1: Double) {
    def union(o: Rect): Rect =
      Rect(math.min(x0, o.x0), math.min(y0, o.y0), math.max(x1, o.x1), math.max(y1, o.y1))
    def overlapsOrTouches(o: Rect, tol: Double): Boolean =
      !(x1 + tol < o.x0 || o.x1 + tol < x0 || y1 + tol < o.y0 || o.y1 + tol < y0)
  }

  /** Pure fixpoint: repeatedly union any overlapping pair until none
    * overlap. O(n²) per pass over small per-page sets, exactly like the
    * reference. */
  def mergeAll(rects: Seq[Rect], tol: Double = 40.0): Vector[Rect] = {
    var acc = rects.toVector
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < acc.length && !changed) {
        var j = i + 1
        while (j < acc.length && !changed) {
          if (acc(i).overlapsOrTouches(acc(j), tol)) {
            val merged = acc(i).union(acc(j))
            acc = (acc.patch(j, Nil, 1).patch(i, Nil, 1)) :+ merged
            changed = true
          }
          j += 1
        }
        i += 1
      }
    }
    // canonical order for deterministic output
    acc.sortBy(r => (r.y0, r.x0, r.y1, r.x1))
  }

  /** Fused-figure frame: per (doc, page), the merged rect set with
    * reading-order indexes (reference then mints FIG ids from these —
    * image_manager.py:211-216). */
  def mergedFigures(spark: SparkSession, dir: String, tol: Double = 40.0): DataFrame = {
    import spark.implicits._
    val rects = Geometry.syntheticRects(spark, dir)
      .select(col("doc"), col("page"), col("x0"), col("y0"), col("x1"), col("y1"))
      .as[(Long, Long, Double, Double, Double, Double)]
    rects
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Double, Double, Double, Double)]) =>
        val merged = mergeAll(it.map(t => Rect(t._3, t._4, t._5, t._6)).toSeq, tol)
        merged.iterator.zipWithIndex.map { case (r, i) =>
          (key._1, key._2, (i + 1).toLong, r.x0, r.y0, r.x1, r.y1)
        }
      }
      .toDF("doc", "page", "idx", "x0", "y0", "x1", "y1")
      .orderBy(col("doc"), col("page"), col("idx"))
  }
}
