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
    // hashes as int128 on the driver where Spark writes int64. The
    // lint is PER OCCURRENCE (r17 advice: a statement-level "has any
    // CAST" check lets an unrelated cast mask a later bare integer
    // sum): a SUM is wrapped iff the token immediately before it is
    // `cast(` or `round(` (both fix the result dtype). Sums over
    // DOUBLE expressions are legitimately bare — those are pinned by
    // NAME and COUNT below, so adding a new bare sum to any oracle
    // fails the lint until it is either wrapped or audited into the
    // allowlist (and DtypeSweepSpec verifies the audit empirically).
    val wrapped = "(?i)\\b(?:cast|round)\\s*\\(\\s*(?:coalesce\\s*\\(\\s*)?$".r
    def bareSums(sql: String): Int =
      "(?i)\\bsum\\s*\\(".r.findAllMatchIn(sql)
        .count(m => wrapped.findFirstIn(sql.substring(0, m.start)).isEmpty)
    // audited bare sums: DOUBLE-typed arguments (same dtype in both
    // engines — no drift risk) or predicate-internal sums that never
    // reach the projected schema (q11: HUGEINT on purpose, the
    // overflow-free threshold compare — see importantStockSql).
    // DtypeSweepSpec is the empirical proof. Keyed name -> count.
    val auditedDoubleSums = Map(
      "q8_market_share" -> 1, "q9_product_profit" -> 1, "q15_top_supplier" -> 1,
      "q17_small_qty_revenue" -> 2, "q19_disc_revenue" -> 1,
      "q20_promo_suppliers" -> 1, "q22_idle_balances" -> 2,
      "q11_important_stock" -> 2, "text_figure_splice" -> 2,
      "text_content_breaks" -> 1, "dedup_simhash" -> 16,
      "dedup_span_find" -> 1, "vec_pq_topk" -> 1, "vec_ivfpq_topk" -> 1,
      "graph_pagerank" -> 12, "chunk_semantic" -> 5, "events_session" -> 1)
    val offending = SparkEntry.oracleSql
      .map { case (name, sql) => name -> bareSums(sql) }
      .filter { case (name, n) => n != auditedDoubleSums.getOrElse(name, 0) }
    assert(offending.isEmpty,
      s"oracles whose bare-SUM count left the audited allowlist " +
        s"(wrap in CAST/ROUND or re-audit): $offending")
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
