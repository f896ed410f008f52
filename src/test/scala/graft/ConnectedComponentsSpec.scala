package graft

import org.apache.spark.sql.functions._
import graft.geom.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation finds components of a chain and an island") {
    // chain 1-2-3-4, island 10-11, singleton edge-less node absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val comps = ConnectedComponents.labelPropagation(spark, edges)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L && comps(4L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("every overlap edge's endpoints land in the same component") {
    val out = ConnectedComponents.componentRects(spark, sf)
    // components partition the rects: member counts sum to total rects
    val total = geom.Geometry.syntheticRects(spark, sf).count()
    val sumMembers = out.agg(sum(col("n_members"))).as[Long].head()
    assert(sumMembers == total)
    // within a component the union box contains all members (by
    // construction of min/max agg) — sanity: boxes are well-formed
    assert(out.filter(col("ux1") < col("ux0") || col("uy1") < col("uy0")).count() == 0)
  }

  test("propagation component count matches per-group fixpoint's merge count upper bound") {
    // union-closure (RectMerge) can only merge MORE than the overlap
    // graph's components, never fewer
    val ccCount = ConnectedComponents.componentRects(spark, sf).count()
    val fixpointCount = geom.RectMerge.mergedFigures(spark, sf).count()
    assert(fixpointCount <= ccCount)
  }
}
