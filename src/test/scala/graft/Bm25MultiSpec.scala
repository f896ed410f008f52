package graft

import org.apache.spark.sql.functions._
import graft.vector.Bm25

/** Multi-query BM25 (the batch decontamination-sweep shape): the batch
  * form must equal the per-query form EXACTLY — same postings, same DF,
  * same rounding — and its physical plan must carry the custom
  * per-key top-k operator (map-side bounded heaps per query_id), not a
  * window sort over every scored (query, doc) pair. */
class Bm25MultiSpec extends SparkSpec {
  import spark.implicits._

  private val batch = SparkEntry.queryBatch

  test("batch results equal the per-query operator, query by query") {
    val k = 5
    val docs = Tables.documents(spark, sf)
    val multi = Bm25.bm25MultiOver(docs, batch, k)
      .select(col("query_id"), col("doc_id"), col("score"), col("n_terms_hit"))
      .collect().toSeq
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    batch.foreach { case (qid, terms) =>
      val single = Bm25.bm25Over(docs, terms, k)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(multi.getOrElse(qid, Set.empty) == single,
        s"query $qid: batch ranking diverged from the per-query operator")
    }
  }

  test("duplicate terms within one query do not double-count (guard parity)") {
    val dup = Seq(7L -> Seq("spark", "spark", "window"))
    val clean = Seq(7L -> Seq("spark", "window"))
    val a = Bm25.bm25MultiOver(Tables.documents(spark, sf), dup, 5).collect().toSeq.map(_.toString)
    val b = Bm25.bm25MultiOver(Tables.documents(spark, sf), clean, 5).collect().toSeq.map(_.toString)
    assert(a == b)
  }

  test("plan uses the custom TopKPerKey operator, not a window sort") {
    val df = Bm25.bm25MultiTopK(spark, sf, batch, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"expected TopKPerKeyExec in the executed plan; got:\n${plan.take(800)}")
    // the per-query ranking must NOT fall back to a full window sort
    assert(!plan.contains("RunningWindowFunction"), "window-sort fallback")
  }

  test("empty batch refuses loudly") {
    intercept[IllegalArgumentException] {
      Bm25.bm25MultiOver(Tables.documents(spark, sf), Seq.empty, 5)
    }
    ()
  }
}
