package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.relational.HeavyHitters

/** [[graft.relational.HeavyHitters]]: the Misra–Gries guarantees
  * (no overcount, n/k undercount, >n/k coverage) as a ScalaCheck
  * property over random skewed streams and random k — plus exactness
  * under capacity, merge across many partitions, and the gate query. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  private def guaranteesHold(xs: Seq[Long], k: Int, parts: Int): Boolean = {
    val sk = HeavyHitters.sketch(spark,
      xs.toDS().repartition(parts), k)
    val exact = xs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val n = xs.size.toLong
    val est = sk.items.map(i => i.value -> i.est).toMap
    sk.n == n &&
      sk.items.size <= k - 1 &&
      est.forall { case (v, e) =>
        e <= exact(v) && e * k >= exact(v) * k - n } &&
      exact.forall { case (v, c) => c * k <= n || est.contains(v) }
  }

  test("MG guarantees hold on random skewed streams (property)") {
    val gen = for {
      k <- Gen.choose(2, 12)
      n <- Gen.choose(1, 400)
      // zipf-ish: small values frequent, tail sparse
      xs <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(0L, 2L)), (3, Gen.choose(3L, 10L)),
        (1, Gen.choose(11L, 500L))))
      parts <- Gen.choose(1, 7)
    } yield (k, xs, parts)
    check(Prop.forAllNoShrink(gen) { case (k, xs, parts) =>
      guaranteesHold(xs, k, parts)
    })
  }

  test("under capacity the sketch is exact") {
    val xs = Seq(1L, 1L, 2L, 2L, 2L, 3L)
    val sk = HeavyHitters.sketch(spark, xs.toDS().repartition(3), k = 10)
    assert(sk.items.map(i => i.value -> i.est).toMap ==
      Map(1L -> 2L, 2L -> 3L, 3L -> 1L) && sk.n == 6L)
  }

  test("a dominant value survives any merge order at tiny k") {
    // 60% of a 32-partition stream is value 7: must be reported
    val xs = Seq.tabulate(2000)(i => if (i % 5 < 3) 7L else (i % 997).toLong + 100L)
    val sk = HeavyHitters.sketch(spark, xs.toDS().repartition(32), k = 4)
    assert(sk.items.exists(_.value == 7L))
    assert(sk.n == 2000L)
  }

  test("gate query: heavy set exact, all contract booleans true") {
    val rows = SparkEntry.queries("agg_heavy_hitters")(spark, sf)
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, b, c, s) => b && c && s })
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
  }
}
