package graft.geom

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounding-box geometry (SURVEY.md §2.8 F16–F19, §2.4 A6/A7) — the
  * figure-extraction pipeline's spatial operators, re-expressed as pure
  * column arithmetic over a (doc, page, x0, y0, x1, y1) frame.
  *
  * The testdata has no figure table, so the demos derive a deterministic
  * bbox set from `part` (same formula in the oracle SQL): each part row
  * becomes a rectangle on a synthetic page.
  */
object Geometry {
  val PageW = 612.0 // US-Letter PDF points (reference renders PDF pages)
  val PageH = 792.0

  /** F16: pad a rect by `pad` points and clip to the page
    * (image_manager.py:144-161). */
  def expandRect(x0: Column, y0: Column, x1: Column, y1: Column, pad: Double)
      : Seq[Column] = Seq(
    greatest(x0 - pad, lit(0.0)).as("ex0"),
    greatest(y0 - pad, lit(0.0)).as("ey0"),
    least(x1 + pad, lit(PageW)).as("ex1"),
    least(y1 + pad, lit(PageH)).as("ey1"),
  )

  /** F17: overlap-or-touch within tolerance (image_manager.py:82-101). */
  def overlaps(ax0: Column, ay0: Column, ax1: Column, ay1: Column,
      bx0: Column, by0: Column, bx1: Column, by1: Column, tol: Double): Column =
    !(ax1 + tol < bx0 || bx1 + tol < ax0 || ay1 + tol < by0 || by1 + tol < ay0)

  /** Deterministic synthetic figure frame derived from `part`:
    * (doc, page, fig_id, x0, y0, x1, y1). Integer-based arithmetic so
    * doubles are exact on both engines. */
  def syntheticRects(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      (col("p_partkey") % 20).cast("long").as("doc"),
      ((col("p_partkey") / 20) % 5 + 1).cast("long").as("page"),
      col("p_partkey").as("fig_key"),
      (col("p_partkey") % 500).cast("double").as("x0"),
      ((col("p_partkey") * 7) % 700).cast("double").as("y0"),
      (col("p_partkey") % 500 + col("p_size") * 3).cast("double").as("x1"),
      ((col("p_partkey") * 7) % 700 + 40).cast("double").as("y1"),
    )

  private[graft] val rectsSql = """
      SELECT CAST(p_partkey % 20 AS BIGINT) AS doc,
             CAST((p_partkey // 20) % 5 + 1 AS BIGINT) AS page,
             p_partkey AS fig_key,
             CAST(p_partkey % 500 AS DOUBLE) AS x0,
             CAST((p_partkey * 7) % 700 AS DOUBLE) AS y0,
             CAST(p_partkey % 500 + p_size * 3 AS DOUBLE) AS x1,
             CAST((p_partkey * 7) % 700 + 40 AS DOUBLE) AS y1
      FROM part"""

  /** F16 + A6: pad/clip each rect, then per-(doc,page) bounding-box
    * union (min/min/max/max) — the rect_union aggregate
    * (image_manager.py:64-80). */
  def pageBboxUnion(spark: SparkSession, dir: String): DataFrame = {
    val r = syntheticRects(spark, dir)
    val padded = r.select(col("doc") +: col("page") +:
      expandRect(col("x0"), col("y0"), col("x1"), col("y1"), 16.0): _*)
    padded.groupBy(col("doc"), col("page"))
      .agg(min(col("ex0")).as("ux0"), min(col("ey0")).as("uy0"),
        max(col("ex1")).as("ux1"), max(col("ey1")).as("uy1"),
        count(lit(1)).as("n_rects"))
      .orderBy(col("doc"), col("page"))
  }

  def pageBboxUnionSql: String = s"""
    WITH rects AS ($rectsSql),
    padded AS (
      SELECT doc, page,
             GREATEST(x0 - 16.0e0, 0.0e0) AS ex0, GREATEST(y0 - 16.0e0, 0.0e0) AS ey0,
             LEAST(x1 + 16.0e0, ${PageW}e0) AS ex1, LEAST(y1 + 16.0e0, ${PageH}e0) AS ey1
      FROM rects)
    SELECT doc, page, MIN(ex0) AS ux0, MIN(ey0) AS uy0,
           MAX(ex1) AS ux1, MAX(ey1) AS uy1, COUNT(*) AS n_rects
    FROM padded GROUP BY doc, page ORDER BY doc, page"""

  /** F17 as a self-join predicate: count of overlapping rect pairs per
    * (doc, page) — the adjacency edge set the A7 connected-component
    * merge runs on. Equi-join on (doc,page) first, then the tolerance
    * predicate — never a blind cross join. */
  def overlapPairs(spark: SparkSession, dir: String): DataFrame = {
    val r = syntheticRects(spark, dir)
    val a = r.select(col("doc"), col("page"), col("fig_key").as("key_a"),
      col("x0").as("ax0"), col("y0").as("ay0"), col("x1").as("ax1"), col("y1").as("ay1"))
    val b = r.select(col("doc"), col("page"), col("fig_key").as("key_b"),
      col("x0").as("bx0"), col("y0").as("by0"), col("x1").as("bx1"), col("y1").as("by1"))
    a.join(b, Seq("doc", "page"))
      .filter(col("key_a") < col("key_b"))
      .filter(overlaps(col("ax0"), col("ay0"), col("ax1"), col("ay1"),
        col("bx0"), col("by0"), col("bx1"), col("by1"), 40.0))
      .groupBy(col("doc"), col("page"))
      .agg(count(lit(1)).as("n_overlapping_pairs"))
      .orderBy(col("doc"), col("page"))
  }

  def overlapPairsSql: String = s"""
    WITH rects AS ($rectsSql)
    SELECT a.doc, a.page, COUNT(*) AS n_overlapping_pairs
    FROM rects a JOIN rects b ON a.doc = b.doc AND a.page = b.page AND a.fig_key < b.fig_key
    WHERE NOT (a.x1 + 40.0e0 < b.x0 OR b.x1 + 40.0e0 < a.x0 OR
               a.y1 + 40.0e0 < b.y0 OR b.y1 + 40.0e0 < a.y0)
    GROUP BY a.doc, a.page ORDER BY a.doc, a.page"""

  /** F19/W4: mint FIG_{page:03d}_{idx:02d} ids in (y0, x0) reading order
    * (image_manager.py:211-216). */
  def figureIds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc"), col("page")).orderBy(col("y0"), col("x0"), col("fig_key"))
    syntheticRects(spark, dir)
      .select(col("doc"), col("page"), col("fig_key"), row_number().over(w).as("idx"))
      .select(col("doc"), col("fig_key"),
        format_string("FIG_%03d_%02d", col("page"), col("idx")).as("fig_id"))
      .orderBy(col("doc"), col("fig_key"))
  }

  def figureIdsSql: String = s"""
    WITH rects AS ($rectsSql)
    SELECT doc, fig_key, printf('FIG_%03d_%02d', page, ROW_NUMBER() OVER
             (PARTITION BY doc, page ORDER BY y0, x0, fig_key)) AS fig_id
    FROM rects ORDER BY doc, fig_key"""
}
