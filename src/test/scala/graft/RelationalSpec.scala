package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions.{col, countDistinct}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("entry() flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query returns a non-empty schema and runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name: empty schema")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("oracle SUMs are cast: DuckDB sum(BIGINT) is HUGEINT, driver hash is dtype-sensitive") {
    // The r14-r16 red-board root cause: a bare sum(...) in oracle SQL
    // hashes as int128 on the driver where Spark writes int64. Coarse
    // lint: any oracle using SUM must cast somewhere (CAST or sqlSum);
    // tools/check.py's dtype-strict compare is the exact gate.
    val bare = SparkEntry.oracleSql.collect {
      case (name, sql)
          if "(?i)\\bsum\\s*\\(".r.findFirstIn(sql).isDefined &&
            "(?i)\\bcast\\s*\\(".r.findFirstIn(sql).isEmpty =>
        name
    }
    assert(bare.isEmpty, s"oracles with SUM but no CAST anywhere: $bare")
  }

  test("dimension joins broadcast (q5 plan contains broadcast exchanges)") {
    val df = relational.Relational.regionRevenue(spark, sf)
    df.count() // materialize so AQE finalizes the plan
    def find(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case other => other +: other.children.flatMap(find)
    }
    val nodes = find(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "expected at least one broadcast exchange for dimension tables")
  }

  test("approx_count_distinct within 10% of exact") {
    val rows = relational.Relational.approxDistinctParts(spark, sf)
      .as[(String, Long, Long)].collect()
    rows.foreach { case (_, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.10)
    }
  }

  test("approx_percentile rank bounds hold for every group and quantile") {
    val rows = relational.Relational.approxPercentilesChecked(spark, sf)
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, n, ok25, ok50, ok90) =>
      assert(n > 0 && ok25 && ok50 && ok90,
        s"sketch rank bound violated for group $g")
    }
  }

  test("skewSafeDistinctCount equals COUNT(DISTINCT) and plans without Expand") {
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val salted = relational.Relational
      .skewSafeDistinctCount(ev, "event_type", "user_id")
    val expected = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct"))
    assert(salted.orderBy("event_type").collect().toSeq ==
      expected.orderBy("event_type").collect().toSeq)
    // the point of the rewrite: every shuffle is keyed on a
    // well-distributed composite, and no Expand-based distinct path
    // (whose final aggregate keys on the hot column alone) appears
    def find(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case other => other +: other.children.flatMap(find)
    }
    assert(!find(salted.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("Expand")),
      "the salted plan must not fall back to the Expand distinct path")
  }

  test("incremental skip excludes exactly the done keys (P7)") {
    val discovered = Seq(1L, 2L, 3L, 4L).toDF("k")
    val done = Seq(2L, 4L).toDF("k")
    val left = meta.Upsert.incrementalSkip(discovered, done, "k")
      .as[Long].collect().sorted
    assert(left.sameElements(Array(1L, 3L)))
  }
}
