package graft

import org.apache.spark.sql.functions._
import graft.geom.PageRank

/** [[graft.geom.PageRank]]: hand-computed integer fixpoint steps,
  * bit-identical ranks under different partitionings (the reason the
  * arithmetic is integral), dangling/absent-target edge handling, and
  * the gate query's determinism. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("two iterations on a hand graph match pencil-and-paper") {
    // 1 -> 2, 2 -> 1, 3 -> 1 and 3 -> 2; node 4 dangling (no out-edges
    // reach it, none leave it)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val r1 = PageRank.run(nodes, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    // S = 1e6. contribs: 1->2: 1e6; 2->1: 1e6; 3 halves 500000 to each.
    // r(1) = 150000 + (1500000*17) div 20 = 150000 + 1275000 = 1425000
    // r(2) = same = 1425000; r(3) = 150000 (no in-mass); r(4) = 150000
    assert(r1 == Map(1L -> 1425000L, 2L -> 1425000L, 3L -> 150000L, 4L -> 150000L))
    val r2 = PageRank.run(nodes, edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    // round 2 in-mass: to 1: r(2)=1425000 + r(3) div 2 = 75000 -> 1500000
    //                  to 2: r(1)=1425000 + 75000 = 1500000
    // r = 150000 + (1500000*17) div 20 = 1425000
    assert(r2 == Map(1L -> 1425000L, 2L -> 1425000L, 3L -> 150000L, 4L -> 150000L))
  }

  test("ranks are bit-identical across partitionings") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
    def ranks(parts: Int) = {
      val nodes = ids.select(col("doc_id").as("node")).repartition(parts)
      val edges = PageRank.modularEdges(ids, "doc_id").repartition(parts)
      PageRank.run(nodes, edges, iters = 3)
        .as[(Long, Long)].collect().toMap
    }
    assert(ranks(1) == ranks(7))
  }

  test("plan depth is CONSTANT in the iteration count (localCheckpoint discipline)") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("node")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L))
      .toDF("src", "dst")
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val shallow = planNodes(PageRank.run(nodes, edges, iters = 2))
    val deep = planNodes(PageRank.run(nodes, edges, iters = 10))
    assert(deep == shallow,
      s"10-round plan ($deep nodes) must not outgrow the 2-round plan " +
        s"($shallow nodes) — each round's localCheckpoint cuts the lineage")
  }

  test("modularEdges: no self-loops, no duplicates, no absent targets") {
    val ids = Seq(0L, 3L, 5L, 9L).toDF("doc_id") // non-contiguous
    val e = PageRank.modularEdges(ids, "doc_id")
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSeq
    val idSet = Set(0L, 3L, 5L, 9L)
    assert(e.nonEmpty)
    assert(e.forall { case (s, d) => s != d && idSet(s) && idSet(d) })
    assert(e.distinct.size == e.size)
  }

  test("gate query: deterministic across two runs") {
    val a = SparkEntry.queries("graph_pagerank")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("graph_pagerank")(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
