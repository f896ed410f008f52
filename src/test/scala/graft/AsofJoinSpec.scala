package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.relational.AsofJoin

/** [[graft.relational.AsofJoin]]: hand-computed backward/forward
  * matches, inclusive-at-equal-ts semantics, tolerance cutoffs,
  * deterministic tie-break among equal right timestamps, and unmatched
  * rows surviving as nulls (merge_asof left semantics). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val quotes = Seq(
    (1L, 10L, ts(1), 100L), (1L, 11L, ts(5), 105L), (1L, 12L, ts(9), 109L),
    (2L, 20L, ts(3), 203L),
  ).toDF("k", "eid", "qts", "px")

  private val trades = Seq(
    (1L, 50L, ts(0)),  // before any quote
    (1L, 51L, ts(5)),  // exactly at quote 11 — inclusive
    (1L, 52L, ts(7)),  // between 11 and 12
    (2L, 53L, ts(59)), // 56 min after quote 20
  ).toDF("k", "eid", "tts")

  test("backward: latest at-or-before, inclusive, unmatched is null") {
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "tts", "qts", "eid")
      .select(col("eid"), col("asof.px")).as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(50L -> None, 51L -> Some(105L), 52L -> Some(105L),
      53L -> Some(203L)))
  }

  test("backward tolerance drops stale matches but keeps the row") {
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "tts", "qts", "eid",
        toleranceUs = Some(10L * 60 * 1000000))
      .select(col("eid"), col("asof.px")).as[(Long, Option[Long])]
      .collect().toMap
    assert(out(53L).isEmpty && out(51L).contains(105L))
  }

  test("forward: earliest at-or-after") {
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "tts", "qts", "eid",
        direction = "forward")
      .select(col("eid"), col("asof.px")).as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(50L -> Some(100L), 51L -> Some(105L),
      52L -> Some(109L), 53L -> None))
  }

  test("equal right timestamps resolve to the greatest tie-break") {
    val dup = Seq((1L, 30L, ts(2), 7L), (1L, 31L, ts(2), 8L))
      .toDF("k", "eid", "qts", "px")
    val t = Seq((1L, 60L, ts(4))).toDF("k", "eid", "tts")
    val out = AsofJoin.asof(t, dup, Seq("k"), "tts", "qts", "eid")
      .select(col("asof.px")).as[Long].head()
    assert(out == 8L)
  }
}
