package graft

import org.apache.spark.sql.functions._
import graft.functions.Nfkc.nfkc
import graft.functions.NfkcNormalize
import graft.geom.RectMerge.Rect
import graft.geom.RectUnionAgg

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("NfkcIdempotence rule collapses nested nfkc calls") {
    // apply the rule directly to the analyzed plan (the shared test
    // session was built without extensions; injection is covered by
    // GraftExtensions wiring)
    val df = Seq("ﬁn").toDF("t").select(nfkc(nfkc(col("t"))).as("x"))
    val before = df.queryExecution.analyzed
    val after = graft.functions.NfkcIdempotence(before)
    def countNfkc(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      p.transformAllExpressions { case e: NfkcNormalize => n += 1; e }
      n
    }
    assert(countNfkc(before) == 2 && countNfkc(after) == 1)
    // semantics preserved
    assert(df.as[String].head() == "fin")
  }

  test("GraftExtensions injects functions + rule into a fresh session") {
    val s2 = spark.newSession()
    functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT nfkc('ﬁn')").collect().head.getString(0) == "fin")
    assert(s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0) == 11.0)
    assert(s2.sql("SELECT l2_squared(array(0.0d, 0.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0) == 25.0)
  }

  test("RectUnionAgg: typed aggregator unions per group with partial agg") {
    val rects = Seq(
      (1L, Rect(0, 0, 10, 10)), (1L, Rect(5, 5, 20, 15)), (2L, Rect(1, 1, 2, 2)),
    ).toDS()
    val out = rects.groupByKey(_._1).mapValues(_._2).agg(RectUnionAgg.column)
      .collect().toMap
    assert(out(1L) == Rect(0, 0, 20, 15))
    assert(out(2L) == Rect(1, 1, 2, 2))
  }
}
