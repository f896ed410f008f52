package graft

import org.apache.spark.sql.functions._

/** Streaming operators run under a real readStream (§2.12): the
  * streaming tumbling aggregation must equal the batch form. */
class StreamingSpec extends SparkSpec {

  test("flatMapGroupsWithState per-user totals equal batch groupBy") {
    import spark.implicits._
    val streamed = streaming.StreamingRunner
      .runStatefulTotals(spark, sf, "graft_state_spec")
      // take the LAST update per user (state evolves across batches)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
      .as[(Long, Long)].collect().toMap
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

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
