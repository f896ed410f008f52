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

  test("one-step IVF finds the query itself at rank 1") {
    Seq(0L, 21L).foreach { q =>
      val top = VectorOps.ivfTopK(spark, sf, q, 5)
        .select("vec_id").as[Long].head()
      assert(top == q)
    }
  }
}
