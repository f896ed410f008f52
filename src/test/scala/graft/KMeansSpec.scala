package graft

import org.apache.spark.sql.functions._
import graft.vector.{KMeans, VectorOps}

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    .cache()

  test("training reduces inertia vs the deterministic seed") {
    val seed = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("list_id"), col("v").as("cv"))
    val trained = KMeans.fit(spark, emb, 16, 3)
    val i0 = KMeans.inertia(emb, seed)
    val i3 = KMeans.inertia(emb, trained)
    assert(i3 < i0, s"inertia did not decrease: seed=$i0 trained=$i3")
  }

  test("trained IVF search finds the query itself at rank 1") {
    val top = KMeans.ivfSearch(spark, sf, queryId = 7)
      .select("vec_id", "score").as[(Long, Double)].collect()
    assert(top.head._1 == 7L && top.head._2 == 1.0)
  }

  test("fit is deterministic across invocations") {
    def sig() = KMeans.fit(spark, emb, 8, 2)
      .orderBy("list_id")
      .select(col("list_id"), md5(to_json(struct(col("cv")))).as("h"))
      .as[(Long, String)].collect().toSeq
    assert(sig() == sig())
  }
}
