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

  /** Oracle-checkable form of the fixpoint: the merged rects are
    * engine-private, but per (doc, page) the fixpoint's defining
    * properties are invariants DuckDB can assert blind —
    *  - disjoint_ok: no two merged rects still overlap within tol
    *    (i.e. the fixpoint was reached);
    *  - bbox_ok: merging preserves the page's overall bounding box;
    *  - contain_ok: every input rect lies inside some merged rect;
    *  - count_ok: merging never increases the rect count.
    * The hash gate goes red iff any property breaks. */
  def mergeInvariants(spark: SparkSession, dir: String, tol: Double = 40.0): DataFrame = {
    // three branches below (count/bbox agg, disjointness self-join,
    // containment join) all consume the fixpoint output — persist so
    // the flatMapGroups merge runs once, not per branch
    val merged = graft.CacheScope.register(mergedFigures(spark, dir, tol).persist())
    val input = Geometry.syntheticRects(spark, dir)
    val inAgg = input.groupBy(col("doc"), col("page")).agg(
      count(lit(1)).as("n_rects"),
      min(col("x0")).as("ix0"), min(col("y0")).as("iy0"),
      max(col("x1")).as("ix1"), max(col("y1")).as("iy1"))
    val mAgg = merged.groupBy(col("doc"), col("page")).agg(
      count(lit(1)).as("n_merged"),
      min(col("x0")).as("mx0"), min(col("y0")).as("my0"),
      max(col("x1")).as("mx1"), max(col("y1")).as("my1"))
    val a = merged.select(col("doc"), col("page"), col("idx"),
      col("x0").as("ax0"), col("y0").as("ay0"), col("x1").as("ax1"), col("y1").as("ay1"))
    val b = merged.select(col("doc"), col("page"), col("idx").as("idx2"),
      col("x0").as("bx0"), col("y0").as("by0"), col("x1").as("bx1"), col("y1").as("by1"))
    val stillOverlapping = a.join(b, Seq("doc", "page"))
      .filter(col("idx") < col("idx2"))
      .filter(Geometry.overlaps(col("ax0"), col("ay0"), col("ax1"), col("ay1"),
        col("bx0"), col("by0"), col("bx1"), col("by1"), tol))
      .groupBy(col("doc"), col("page")).agg(count(lit(1)).as("n_overlap"))
    val contained = input.join(
      merged.select(col("doc"), col("page"), col("x0").as("cx0"), col("y0").as("cy0"),
        col("x1").as("cx1"), col("y1").as("cy1")),
      Seq("doc", "page"))
      .filter(col("cx0") <= col("x0") && col("cy0") <= col("y0") &&
        col("cx1") >= col("x1") && col("cy1") >= col("y1"))
      .groupBy(col("doc"), col("page")).agg(countDistinct(col("fig_key")).as("n_contained"))
    inAgg.join(mAgg, Seq("doc", "page"))
      .join(stillOverlapping, Seq("doc", "page"), "left")
      .join(contained, Seq("doc", "page"), "left")
      .select(col("doc"), col("page"), col("n_rects"),
        (coalesce(col("n_overlap"), lit(0L)) === 0).as("disjoint_ok"),
        (col("mx0") === col("ix0") && col("my0") === col("iy0") &&
          col("mx1") === col("ix1") && col("my1") === col("iy1")).as("bbox_ok"),
        (coalesce(col("n_contained"), lit(0L)) === col("n_rects")).as("contain_ok"),
        (col("n_merged") <= col("n_rects")).as("count_ok"))
      .orderBy(col("doc"), col("page"))
  }

  def mergeInvariantsSql: String = s"""
    SELECT doc, page, COUNT(*) AS n_rects, TRUE AS disjoint_ok, TRUE AS bbox_ok,
           TRUE AS contain_ok, TRUE AS count_ok
    FROM (${Geometry.rectsSql})
    GROUP BY doc, page ORDER BY doc, page"""
}
