package graft

import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.functions._

/** Properties of the hash-stability machinery itself. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("exactSum is partitioning-invariant (2-decimal fixed point)") {
    val genVals = Gen.listOfN(200, Gen.chooseNum(-99999L, 99999L).map(_ / 100.0))
    check(Prop.forAll(genVals) { vs =>
      if (vs.isEmpty) true
      else {
        val a = vs.toDF("x").repartition(1)
          .agg(Exact.exactSum(col("x"))).as[Double].head()
        val b = vs.toDF("x").repartition(7)
          .agg(Exact.exactSum(col("x"))).as[Double].head()
        a == b
      }
    })
  }

  test("splice with empty offsets is identity; inserts appear at offsets") {
    val docs = Seq((1L, "hello world document")).toDF("k", "t")
    val noOffsets = Seq.empty[(Long, Long)].toDF("k", "off")
    val id = text.MarkdownOps.spliceAt(docs, "t", "k", noOffsets, "off", "<X>")
      .as[(Long, String)].head()
    assert(id._2 == "hello world document")
    val offs = Seq((1L, 0L), (1L, 6L)).toDF("k", "off")
    val out = text.MarkdownOps.spliceAt(docs, "t", "k", offs, "off", "<X>")
      .as[(Long, String)].head()
    assert(out._2 == "<X>hello <X>world document")
  }

  test("rolling hash is prefix-sensitive but ascii-stable") {
    val h = (s: String) => Seq(s).toDF("t")
      .select(text.TextFunctions.rollingHash(col("t"))).as[Long].head()
    assert(h("abc") != h("abd"))
    assert(h("abc") == h("abc"))
    assert(h("") == 0L)
  }
}
