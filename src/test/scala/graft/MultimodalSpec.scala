package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payloads with typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("media").dataType.typeName == "binary")
    val formats = df.select("format").distinct().as[String].collect().toSet
    assert(formats == Set("png", "jpeg", "wav", "mp4"))
  }

  test("stub decode preserves row count and derives features from bytes") {
    val feats = Multimodal.decodeFeatures(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(feats.count() == n)
    val r = feats.filter(col("doc_id") === 0).head()
    val textLen = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select(length(col("text"))).as[Int].head()
    assert(r.getAs[Long]("n_bytes") == textLen)
    assert(r.getAs[Long]("width") == textLen % 640)
  }

  test("frame sampling keeps every 2nd fixed-size frame of mp4 payloads") {
    val frames = Multimodal.sampleFrames(spark, sf)
    val idx = frames.select("frame_idx").distinct().as[Long].collect().toSet
    assert(idx.forall(_ % 2 == 0))
    val maxLen = frames.agg(max(col("frame_len"))).as[Long].head()
    assert(maxLen <= 100)
  }
}
