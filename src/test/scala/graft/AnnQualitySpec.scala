package graft

import graft.vector.{KMeans, VectorOps}

/** Retrieval quality of the approximate paths vs the brute-force
  * ground truth — an ANN variant that prunes 90% of work but misses
  * the neighbors is not "done" (north-star similarity search). */
class AnnQualitySpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  test("trained-IVF recall@10 >= 0.5 vs brute force across queries") {
    val recalls = Seq(0L, 7L, 42L).map { q =>
      val truth = ids(VectorOps.cosineTopK(spark, sf, q, 10))
      val approx = ids(KMeans.ivfSearch(spark, sf, q, 10))
      truth.intersect(approx).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean IVF recall@10 too low: $recalls")
  }

  test("sign-LSH bucket always contains the query itself") {
    Seq(0L, 13L, 99L).foreach { q =>
      val got = ids(VectorOps.annLshTopK(spark, sf, q, 10))
      assert(got.contains(q), s"query $q missing from its own LSH bucket")
    }
  }

  test("random-hyperplane buckets recall more neighbors than axis-aligned") {
    import org.apache.spark.sql.functions._
    // 4 bits so buckets are populous enough for recall to be meaningful
    val bits = 4
    val buckets = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        VectorOps.signLshBucket(col("embedding"), bits).as("axis"),
        VectorOps.rhpLshBucket(VectorOps.asDouble(col("embedding")), bits).as("rhp"))
      .as[(Long, Long, Long)].collect()
    val axis = buckets.map(r => r._1 -> r._2).toMap
    val rhp = buckets.map(r => r._1 -> r._3).toMap
    val queries = Seq(0L, 7L, 13L, 42L, 99L)
    def meanRecall(b: Map[Long, Long]): Double = queries.map { q =>
      val truth = ids(VectorOps.cosineTopK(spark, sf, q, 10))
      val cand = b.collect { case (id, bk) if bk == b(q) => id }.toSet
      truth.intersect(cand).size.toDouble / truth.size
    }.sum / queries.size
    val ra = meanRecall(axis)
    val rr = meanRecall(rhp)
    info(f"recall@10: axis-aligned $ra%.2f, random-hyperplane $rr%.2f")
    assert(rr > ra, f"projected LSH must beat the axis baseline: $rr%.2f <= $ra%.2f")
  }

  test("PQ ADC ranks the query itself first, even for non-codeword queries") {
    Seq(0L, 42L, 137L).foreach { q =>
      val top = VectorOps.pqTopK(spark, sf, q, 5)
        .select("vec_id").as[Long].collect().toSeq
      assert(top.head == q, s"query $q not rank 1: $top")
    }
  }

  test("PQ candidates recall brute-force neighbors (compressed-domain quality)") {
    val queries = Seq(0L, 7L, 42L)
    val recalls = queries.map { q =>
      val truth = ids(VectorOps.cosineTopK(spark, sf, q, 10))
      // PQ ranks by L2 over quantized codes; take a 30-candidate pool
      // as a re-rank stage would
      val cand = ids(VectorOps.pqTopK(spark, sf, q, 30))
      truth.intersect(cand).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ candidate recall@10 (pool 30): $mean%.2f")
    assert(mean >= 0.2, s"PQ candidates too weak: $recalls")
  }

  test("one-step IVF finds the query itself at rank 1") {
    Seq(0L, 21L).foreach { q =>
      val top = VectorOps.ivfTopK(spark, sf, q, 5)
        .select("vec_id").as[Long].head()
      assert(top == q)
    }
  }
}
