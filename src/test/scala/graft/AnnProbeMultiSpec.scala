package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.plans.AnnProbe
import graft.vector.VectorOps

/** Multi-query ANN over the declared LSH index (the dense twin of the
  * BM25 batch sweep): ONE index scan serves the whole query batch via
  * a broadcast probe map + bucket equi-join. Pins: batch ranking ==
  * the per-query probe-filtered brute force for every query in the
  * batch, exactly one index scan in the executed plan, the broadcast
  * probe join, and the custom per-key top-k operator (no window-sort
  * fallback). */
class AnnProbeMultiSpec extends SparkSpec {

  private val Bits = 8
  private val Dim = 64
  private val Seed = 42L
  private val K = 5

  test("batch results equal the per-query probe top-k, query by query") {
    SparkEntry.clearAnnProbeFixtureForTests()
    val df = SparkEntry.queries("vec_ann_probe_multi_topk")(spark, sf)
    val got = df.collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // independent per-query reference: bucket the corpus in-memory (no
    // parquet, no fixture memo), probe-filter, score, top-K
    val bucketed = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        VectorOps.rhpLshBucket(col("v"), Bits, Dim, Seed).as("bucket"))
    SparkEntry.queryVecBatch.foreach { qid =>
      val q = Tables.embeddings(spark, sf).filter(col("vec_id") === qid)
        .select(VectorOps.asDouble(col("embedding")))
        .head().getSeq[Double](0).toArray
      val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
      val qc = array(q.map(lit): _*)
      val single = bucketed
        .filter(col("bucket").isin(probes.map(java.lang.Long.valueOf): _*))
        .select(col("vec_id"), round(VectorOps.cosine(col("v"), qc), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(K).collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.getOrElse(qid, Seq.empty) == single,
        s"query $qid: batch ranking diverged from the per-query probe top-k")
    }
  }

  test("plan: one index scan, broadcast probe join, TopKPerKey operator") {
    val df = SparkEntry.queries("vec_ann_probe_multi_topk")(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan
    val scans = executed.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.size == 1,
      s"expected exactly ONE index scan serving the batch; got ${scans.size}")
    val plan = executed.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe map must ride a broadcast:\n${plan.take(800)}")
    assert(plan.contains("TopKPerKey"),
      s"expected TopKPerKeyExec in the executed plan:\n${plan.take(800)}")
    assert(!plan.contains("RunningWindowFunction"), "window-sort fallback")
  }

  test("probe sets are duplicate-free, so candidate pairs need no dedup") {
    // every vector lands in exactly one bucket; with a distinct probe
    // set per query the bucket equi-join cannot emit a (query, vec)
    // pair twice — pin the distinctness the operator relies on
    SparkEntry.queryVecBatch.foreach { qid =>
      val q = Tables.embeddings(spark, sf).filter(col("vec_id") === qid)
        .select(VectorOps.asDouble(col("embedding")))
        .head().getSeq[Double](0).toArray
      val probes = AnnProbe.probeBuckets(q, Bits, Dim, Seed, 1)
      assert(probes.distinct.length == probes.length,
        s"query $qid: probe set carries duplicates")
    }
  }
}
