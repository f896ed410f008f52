package graft

import org.apache.spark.sql.functions._

/** Streaming operators run under a real readStream (§2.12): the
  * streaming tumbling aggregation must equal the batch form. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals batch tumbling window") {
    val streamed = streaming.StreamingRunner
      .runTumblingStream(spark, sf, "graft_stream_spec")
      .orderBy(col("window_start_us"), col("event_type"))
      .collect().toSeq
    val batch = streaming.EventWindows.tumbling(spark, sf)
      .collect().toSeq
    assert(streamed == batch)
  }
}
