package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Exact._
import graft.Tables

/** General relational query surface (SURVEY.md §2.3–§2.7, §7.1
  * `graft.relational`) demonstrated over the TPC-H-ish star schema.
  *
  * Scale notes (the 100 TB design stance):
  *  - dimension tables (region/nation/supplier/part/customer) are always
  *    the build side and explicitly `broadcast()` — no shuffle of the
  *    fact table for dimension enrichment;
  *  - fact⋈fact joins (orders⋈lineitem) shuffle on the join key once and
  *    aggregate partially map-side before the exchange;
  *  - every query ends in a deterministic ORDER BY so results are
  *    hash-stable (floats additionally go through [[graft.Exact]]).
  */
object Relational {

  /** Ceiling for [[broadcastIfSmall]]: 128 MB of summed LEAF-SCAN
    * bytes. Comfortably inside the guide's "a few hundred MB is
    * usually fine" even after row-format framing expansion, and far
    * under the 8 GB broadcast hard cap. */
  private val BroadcastGuardBytes: BigInt = BigInt(128L << 20)

  /** Size-GUARDED broadcast hint for dimension sides that grow with the
    * scale factor (customer/supplier/part and frames derived from
    * them). The r19 pattern hinted these unconditionally: correct at
    * bench SFs, but at 100 TB `p_name LIKE '%bolt%'` still selects a
    * fixed FRACTION of a part table that grows with SF — an explicit
    * hint there FORCES the broadcast attempt (driver OOM) instead of
    * letting the planner/AQE fall back to a shuffle join from real
    * runtime sizes.
    *
    * The measure is the SUM OF THE SIDE'S LEAF SCAN BYTES, not the
    * plan-level estimate: without CBO the composite estimators are
    * unusable in both directions (Join multiplies its children's byte
    * counts — a customer⋈nation dimension "costs" their product;
    * Filter never shrinks below the scan), while the raw bytes under
    * the side are exactly the quantity that grows with the corpus —
    * which is the question this guard asks. The snowflake sides hinted
    * here join a base dimension to key-unique lookups (≤ one nation
    * row per customer), so leaf-sum also bounds the true built size up
    * to framing. At sf0.1 every side sums to well under a megabyte →
    * the guard accepts and the plan is byte-identical to the bare
    * hint; at 100 TB customer/part/supplier leaves are TB-scale → the
    * hint is withheld. Fixed-size sides (nation/region, one-row scalar
    * aggregates) keep their bare hints — scale-free by construction.
    * Driver-side stats only; no job. */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (leafBytes <= BroadcastGuardBytes) broadcast(df) else df
  }

  /** Q1-style pricing summary: scan-heavy, group-by-low-cardinality.
    * Partial aggregation makes the shuffle O(#groups), not O(rows). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def pricingSummarySql: String = s"""
    SELECT l_returnflag, l_linestatus,
           ${sqlSum("l_quantity")} AS sum_qty,
           ${sqlSum("l_extendedprice")} AS sum_base_price,
           ${sqlSum("l_extendedprice*(1-l_discount)", 4)} AS sum_disc_price,
           ${sqlSum("l_extendedprice*(1-l_discount)*(1+l_tax)", 6)} AS sum_charge,
           ${sqlAvg("l_quantity")} AS avg_qty,
           ${sqlAvg("l_extendedprice")} AS avg_price,
           ${sqlAvg("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Q3-style: who are the highest-revenue open orders. customer is a
    * broadcast dimension; orders⋈lineitem is the one real shuffle. */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .select(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("o_orderdate_us"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def topRevenueOrdersSql: String = s"""
    SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
           ${sqlSum("l_extendedprice*(1-l_discount)", 4)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, epoch_us(o_orderdate), o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q5-style: revenue by nation inside one region — the full snowflake
    * join path. All dimensions broadcast; lineitem never repartitions
    * except for the final tiny group-by. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir)
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"),
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  def regionRevenueSql: String = s"""
    SELECT r_name, n_name,
           ${sqlSum("l_extendedprice*(1-l_discount)", 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""

  /** Left-anti join (SURVEY.md §2.3 ABSENT + U3): customers that never
    * ordered, counted per market segment. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("c_mktsegment"))

  def customersWithoutOrdersSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Left-semi join: orders that contain at least one high-quantity
    * line, counted per priority. */
  def ordersWithBigLines(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(
        Tables.lineitem(spark, dir).filter(col("l_quantity") >= 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  def ordersWithBigLinesSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Broadcast-dimension enrichment: part-brand revenue. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcastIfSmall(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        exactSum(col("l_extendedprice"), 2).as("revenue"),
        exactSum(col("l_quantity")).as("qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
      )
      .orderBy(col("p_brand"))

  def brandRevenueSql: String = s"""
    SELECT p_brand, ${sqlSum("l_extendedprice")} AS revenue,
           ${sqlSum("l_quantity")} AS qty,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  /** ROLLUP aggregation (SURVEY.md §2.4 ABSENT→built-in). Null group
    * keys are mapped to 'ALL' so both engines agree textually. */
  def rollupReturns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  def rollupReturnsSql: String = s"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus"""

  /** CUBE aggregation over order status × priority. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), exactSum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  def cubeOrdersSql: String = s"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, ${sqlSum("o_totalprice")} AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  /** Distinct aggregation per segment. */
  def segmentCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcastIfSmall(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        exactAvg(col("o_totalprice")).as("avg_price"),
      )
      .orderBy(col("c_mktsegment"))

  def segmentCustomersSql: String = s"""
    SELECT c_mktsegment, COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders, ${sqlAvg("o_totalprice")} AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // --- window functions (SURVEY.md §2.5 W1–W4 patterns) ---

  /** W1 pattern (running max / running sum): per-customer running order
    * total in (date, key) order. Frame is totally ordered → the
    * sequential fold is deterministic on both engines. */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 10 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total"),
        max(col("o_totalprice")).over(w).as("running_max"),
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def runningCustomerSpendSql: String = """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           MAX(o_totalprice)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
    FROM orders WHERE o_custkey % 10 = 0
    ORDER BY o_custkey, o_orderkey"""

  /** W2 pattern (lead ranges): day gaps between consecutive orders per
    * customer — the page-anchor range construction shape. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 20 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate")).cast("long").as("days_to_next"),
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def orderGapsSql: String = """
    SELECT o_custkey, o_orderkey,
           date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE)) AS days_to_next
    FROM orders WHERE o_custkey % 20 = 0
    ORDER BY o_custkey, o_orderkey"""

  /** W3/W4 pattern (row_number top-N per group): top-3 orders per
    * customer by price, deterministic tie-break on key. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn").cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def topOrdersPerCustomerSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** Global top-k (TakeOrderedAndProject): the distributed top-k plan —
    * per-partition heaps, then a k-row merge on the driver. */
  def topLineitems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  def topLineitemsSql: String = """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
    FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"""

  /** Set operations (SURVEY.md §2.7): customers with open orders minus
    * customers with failed... (EXCEPT = distinct anti). */
  def setOpsCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val done = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.except(done).orderBy(col("o_custkey"))
  }

  def setOpsCustkeysSql: String = """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey"""

  /** Date functions (SURVEY.md §2.8 "date: ABSENT → engine built-ins"):
    * monthly order volume. */
  def monthlyOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total"))
      .orderBy(col("month"))

  def monthlyOrdersSql: String = s"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total
    FROM orders GROUP BY 1 ORDER BY 1"""

  /** Statistical aggregates: correlation / stddev (rounded — Welford vs
    * naive accumulation differ in the last ulps across engines). */
  def statsSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(stddev_samp(col("l_discount")), 6).as("sd_discount"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        count(lit(1)).as("n"),
      )
      .orderBy(col("l_returnflag"))

  def statsSummarySql: String = """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(stddev_samp(l_discount), 6) AS sd_discount,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** GROUPING SETS (beyond rollup/cube: arbitrary set list) via the
    * SQL surface over a registered view. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             ${sqlSum("l_quantity")} AS sum_qty
      FROM lineitem_v
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY returnflag, linestatus""")
  }

  def groupingSetsSql: String = s"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY returnflag, linestatus"""

  /** PIVOT: returnflag × linestatus quantity matrix with an explicit
    * (deterministic) pivot-value list. Oracle = manual conditional
    * aggregation, the relational algebra PIVOT sugar expands to. */
  def pivotReturns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(exactSum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      .orderBy(col("l_returnflag"))

  def pivotReturnsSql: String = s"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** UNPIVOT/melt: wide → long over customer/supplier balances. */
  def unpivotBalances(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal_acct"),
        (col("c_acctbal") * 2).as("bal_double"))
      .unpivot(Array(col("key")), Array(col("bal_acct"), col("bal_double")),
        "measure", "value")
      .filter(col("key") % 50 === 0)
      .orderBy(col("key"), col("measure"))

  def unpivotBalancesSql: String = """
    SELECT c_custkey AS key, 'bal_acct' AS measure, c_acctbal AS value
    FROM customer WHERE c_custkey % 50 = 0
    UNION ALL
    SELECT c_custkey AS key, 'bal_double' AS measure, c_acctbal * 2 AS value
    FROM customer WHERE c_custkey % 50 = 0
    ORDER BY key, measure"""

  /** Exact percentiles (linear interpolation — identical formula both
    * engines; rounded defensively). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  def percentilesSql: String = """
    SELECT o_orderstatus,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Approx-percentile sketch gate — the 100 TB scale path for
    * quantiles. `percentile()` holds every group value; the GK-family
    * `approx_percentile(accuracy = A)` keeps mergeable bounded state
    * with a guaranteed rank error ≤ n/A. The estimates themselves are
    * engine-private sketch outputs, so the oracle asserts the sketch's
    * CONTRACT: each estimate's true rank (recomputed with one broadcast
    * of the 9-row estimate frame against the fact — no second shuffle of
    * orders) must lie within the documented bound (±1 extra slack for
    * rank-convention edges). Reduced to booleans the oracle asserts
    * blind — sketch drift breaks the hash (same pattern as
    * [[approxDistinctChecked]]). */
  def approxPercentilesChecked(spark: SparkSession, dir: String): DataFrame = {
    val acc = 10000
    val qs = Seq(0.25, 0.5, 0.9)
    val orders = Tables.orders(spark, dir)
    val est = orders.groupBy(col("o_orderstatus"))
      .agg(
        expr(s"approx_percentile(o_totalprice, array(${qs.mkString(", ")}), $acc)").as("ap"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus").as("g"), col("n"),
        posexplode(col("ap")).as(Seq("qi", "v")))
    val p = when(col("qi") === 0, qs(0)).when(col("qi") === 1, qs(1)).otherwise(qs(2))
    val eps = lit(1.0) / acc
    val checked = orders
      .join(broadcast(est), col("o_orderstatus") === col("g"))
      .groupBy(col("o_orderstatus"), col("qi"), col("n"))
      .agg(
        sum(when(col("o_totalprice") <= col("v"), 1L).otherwise(0L)).as("n_le"),
        sum(when(col("o_totalprice") < col("v"), 1L).otherwise(0L)).as("n_lt"))
      .select(col("o_orderstatus"), col("qi"), col("n"),
        (col("n_le") >= floor((p - eps) * col("n")) - 1 &&
          col("n_lt") <= ceil((p + eps) * col("n")) + 1).as("ok"))
    checked.groupBy(col("o_orderstatus"), col("n"))
      .agg(
        max(when(col("qi") === 0, col("ok"))).as("ok_p25"),
        max(when(col("qi") === 1, col("ok"))).as("ok_p50"),
        max(when(col("qi") === 2, col("ok"))).as("ok_p90"))
      .orderBy(col("o_orderstatus"))
  }

  def approxPercentilesCheckedSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n,
           TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p90
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** HLL++ sketch cardinality (SURVEY.md §2.4 ABSENT→built-in
    * approx_count_distinct). Engine-specific sketch ⇒ no cross-engine
    * oracle; the driver records a rows-only check and ApproxSpec bounds
    * the relative error against the exact count. */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
      )
      .orderBy(col("l_returnflag"))

  /** Oracle-checkable form of the HLL sketch: the estimate itself is
    * engine-private, but its ±5% accuracy bound is an invariant DuckDB
    * can assert blind — the hash gate goes red iff the sketch drifts. */
  def approxDistinctChecked(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact_parts"),
      )
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")) <= col("exact_parts") * 0.05).as("hll_ok"))
      .orderBy(col("l_returnflag"))

  def approxDistinctCheckedSql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS hll_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Q18-style: large-volume customers — HAVING over a fact join
    * aggregate, then enrich and re-aggregate. */
  def largeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(exactSum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    Tables.orders(spark, dir)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcastIfSmall(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("o_orderdate_us"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(30)
  }

  def largeVolumeCustomersSql: String = s"""
    WITH big AS (
      SELECT l_orderkey, ${sqlSum("l_quantity")} AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING ${sqlSum("l_quantity")} > 150)
    SELECT c_custkey, c_name, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           o_totalprice, total_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 30"""

  /** Q7-style: shipping volume between two nations by year — the
    * classic two-sided dimension filter + date extraction. */
  def nationTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("c_nk"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(cust.select(col("c_custkey"), col("cust_nation"))), col("o_custkey") === col("c_custkey"))
      .join(broadcastIfSmall(supp.select(col("s_suppkey"), col("supp_nation"))), col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("volume"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 10)
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  def nationTradeVolumeSql: String = s"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
           ${sqlSum("l_extendedprice*(1-l_discount)", 4)} AS volume,
           COUNT(*) AS n
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3 HAVING COUNT(*) >= 10
    ORDER BY 1, 2, 3"""

  /** Q10-style: revenue lost to returned items per customer, top 20. */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("lost_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)

  def returnedItemRevenueSql: String = s"""
    SELECT c_custkey, c_name, c_mktsegment,
           ${sqlSum("l_extendedprice*(1-l_discount)", 4)} AS lost_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, c_custkey LIMIT 20"""

  /** Correlated scalar subquery (Catalyst decorrelates it into an
    * aggregate + join — SURVEY.md §4 "subquery decorrelation"): orders
    * priced above 1.5× their customer's average order. */
  def ordersAboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(s"""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_v o
      WHERE o_totalprice > 1.5 * (
        SELECT ${Exactish("o_totalprice")} / COUNT(*)
        FROM orders_v i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_custkey, o_orderkey""")
  }

  private def Exactish(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  def ordersAboveCustomerAvgSql: String = s"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT ${Exactish("o_totalprice")} / COUNT(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o_custkey, o_orderkey"""

  /** Q22-style: well-funded customers (balance above the positive-
    * balance average, an uncorrelated scalar subquery) with no orders
    * (anti-join), counted per nation prefix. */
  def richIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v2")
    spark.sql(s"""
      SELECT c_nationkey, COUNT(*) AS n_customers,
             ${Exactish("c_acctbal")} AS total_bal
      FROM customer_v c
      WHERE c_acctbal > (SELECT ${Exactish("c_acctbal")} / COUNT(*)
                         FROM customer_v WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders_v2 WHERE o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  def richIdleCustomersSql: String = s"""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           ${Exactish("c_acctbal")} AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT ${Exactish("c_acctbal")} / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** Z-order curve value for two bounded integer dimensions — the
    * multi-dimensional clustering key for data-skipping layouts: rows
    * sorted/range-partitioned by z-value keep both dimensions locally
    * clustered, so parquet row-group min/max stats prune on EITHER
    * predicate. Pure bit-interleave arithmetic (portable to the
    * oracle). */
  def zorderValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val xbit = shiftright(x, i).bitwiseAND(1).cast("long") * (1L << (2 * i))
      val ybit = shiftright(y, i).bitwiseAND(1).cast("long") * (1L << (2 * i + 1))
      xbit + ybit
    }.reduce(_ + _)

  /** Parts clustered by z-order of (size, price bucket): the layout a
    * 100 TB table would be written in to serve both size- and
    * price-range scans. */
  def zorderParts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("long").as("size"),
        floor(col("p_retailprice") / lit(100)).cast("long").as("price_bucket"))
      .withColumn("zval", zorderValue(col("size"), col("price_bucket"), 6))
      .orderBy(col("zval"), col("p_partkey"))
      .limit(100)

  def zorderPartsSql: String = {
    val z = (0 until 6).map { i =>
      s"((size >> $i) & 1) * ${1L << (2 * i)} + ((price_bucket >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""
    WITH p AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
             CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket
      FROM part)
    SELECT p_partkey, size, price_bucket, CAST($z AS BIGINT) AS zval
    FROM p ORDER BY zval, p_partkey LIMIT 100"""
  }

  /** INTERSECT: customers active in both halves of the order history. */
  /** SKEW-SAFE distinct count: per-key COUNT(DISTINCT of) when `key`
    * has FEW hot values — the shape that breaks at 100 TB, because a
    * plain distinct-count shuffles every row to #distinct-keys
    * reducers (events has a handful of event types; five reducers own
    * the whole table and the job runs at parallelism five, spilling).
    * Three stages, each well-distributed:
    *   1. dedup (key, of) pairs — shuffle keyed on BOTH columns, so
    *      rows spread across all partitions regardless of key skew;
    *   2. count survivors per (key, salt-of-`of`) — `buckets`-way
    *      partial counts, again spread;
    *   3. sum the per-salt counts per key — #keys × buckets tiny rows.
    * Note the contrast with ALGEBRAIC aggs (sum/count), where Spark's
    * map-side partial aggregation already neutralizes key skew — it is
    * the DISTINCT (per-key state proportional to cardinality) that
    * needs the salt. Deterministic salt (md5 of `of`) keeps plans and
    * results reproducible; any uniform hash works. */
  def skewSafeDistinctCount(df: DataFrame, key: String, of: String,
      buckets: Int = 32): DataFrame =
    df.select(col(key), col(of))
      .distinct()
      .groupBy(col(key),
        pmod(graft.text.TextFunctions.md5Long(col(of).cast("string")), lit(buckets))
          .as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))

  /** [[skewSafeDistinctCount]] over events: distinct users per (hot)
    * event type. The oracle is the plain relational definition — the
    * salted three-stage plan must be value-identical to
    * COUNT(DISTINCT). */
  def saltedDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    skewSafeDistinctCount(
      Tables.events(spark, dir).select(col("event_type"), col("user_id")),
      key = "event_type", of = "user_id")
      .orderBy(col("event_type"))

  def saltedDistinctUsersSql: String = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type ORDER BY event_type"""

  def intersectCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val early = o.filter(col("o_orderdate") < lit("1997-01-01")).select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1997-01-01")).select(col("o_custkey"))
    early.intersect(late).orderBy(col("o_custkey"))
  }

  def intersectCustkeysSql: String = """
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    ORDER BY o_custkey"""

  /** Q6-style: forecast revenue change — the pure scan-filter-sum
    * query. The price×discount product is computed in double (both
    * engines multiply identical doubles) and cast to DECIMAL(18,4)
    * BEFORE summing, so the aggregate is order-free exact. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  def forecastRevenueSql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  /** Q4-style: order-priority checking — orders with at least one
    * late-shipping line (shipdate > orderdate + 30 days; the testdata
    * carries no commit/receipt dates, so lateness is defined against
    * the order date), counted per priority. EXISTS = left-semi join. */
  def orderPriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
      col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  def orderPriorityCountsSql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Q14-style: promotion revenue share for one month — conditional
    * ratio over a broadcast-joined part dimension; numerator and
    * denominator are exact decimal sums, the percentage is one IEEE
    * division. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val net = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(org.apache.spark.sql.types.DecimalType(18, 4))
    l.join(broadcastIfSmall(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"), net).otherwise(lit(0.0).cast(
          org.apache.spark.sql.types.DecimalType(18, 4)))).cast("double") * 100.0 /
          sum(net).cast("double")).as("promo_pct"),
        count(lit(1)).as("n_lines"))
  }

  def promoRevenueSql: String = """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0 /
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'"""

  /** Synthesized partsupp (the testdata ships none — NOTES backlog):
    * each part gets 4 suppliers via deterministic integer arithmetic,
    * same formula in the oracle. Costs are kept as integer CENTS so
    * per-part aggregates are order-free exact; the presentation double
    * is a single division at the end. The supplier-count scalar is a
    * broadcast literal frame, not a collected value. */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val nSupp = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
    Tables.part(spark, dir)
      .crossJoin(broadcast(nSupp))
      .select(col("p_partkey"), explode(sequence(lit(0), lit(3))).as("i"), col("n_supp"))
      .select(
        col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % col("n_supp")).as("ps_suppkey"),
        ((col("p_partkey") * 31 + col("i") * 17) % 9999 + 1).as("ps_availqty"),
        ((col("p_partkey") * 13 + col("i") * 7) % 100000).as("ps_cost_cents"))
  }

  private[relational] val partsuppSqlCte: String = """
    ns AS (SELECT COUNT(*) AS n_supp FROM supplier),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + u.i * 13) % n_supp AS ps_suppkey,
             (p_partkey * 31 + u.i * 17) % 9999 + 1 AS ps_availqty,
             (p_partkey * 13 + u.i * 7) % 100000 AS ps_cost_cents
      FROM part, ns, LATERAL (SELECT unnest([0, 1, 2, 3]) AS i) u)"""

  /** Q2-style: minimum-cost supplier — for every small part, the
    * supplier(s) achieving the per-part minimum supply cost, enriched
    * with nation. The correlated-min subquery is the groupBy-min +
    * equi-join rewrite (what Catalyst would decorrelate to); cost
    * equality is on integer cents, so ties are exact. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val minCost = ps.groupBy(col("ps_partkey"))
      .agg(min(col("ps_cost_cents")).as("min_cents"))
    ps.join(minCost, Seq("ps_partkey"))
      .filter(col("ps_cost_cents") === col("min_cents"))
      .join(Tables.part(spark, dir).filter(col("p_size") < 5),
        col("ps_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        (col("ps_cost_cents") / lit(100.0)).as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("ps_supplycost"))
  }

  def minCostSupplierSql: String = s"""
    WITH $partsuppSqlCte,
    mc AS (SELECT ps_partkey, MIN(ps_cost_cents) AS min_cents FROM partsupp GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey,
           ps_cost_cents / 100.0 AS ps_supplycost
    FROM partsupp
    JOIN mc USING (ps_partkey)
    JOIN part ON ps_partkey = p_partkey AND p_size < 5
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE ps_cost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_supplycost"""

  /** Q11-style: important stock — parts whose inventory value exceeds
    * 1/10000 of the total. Value stays in integer cents until the
    * final projection; the threshold compare is integer-exact AND
    * overflow-free: `value > total div 10000` is equivalent to
    * `value * 10000 > total` for non-negative longs (floor division:
    * total = 10000·q + r, 0 ≤ r < 10000 ⟹ both sides reduce to
    * value ≥ q + 1), but never widens past int64 — the multiply form
    * wrapped silently in Spark's non-ANSI LongType at extreme SF while
    * DuckDB evaluated it in HUGEINT (r18 advice). The total is a
    * broadcast scalar. */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val perPart = ps.groupBy(col("ps_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("value_cents"))
    val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents") > expr("total_cents div 10000"))
      .select(col("ps_partkey"), (col("value_cents") / lit(100.0)).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** Oracle note (r17 advice): the intermediate sums stay BARE —
    * DuckDB HUGEINT — on purpose. Neither `value_cents` nor
    * `total_cents` is projected (only `value_cents / 100.0`, DOUBLE
    * in both engines), so their width never reaches the dtype-strict
    * compare; and the threshold is the floor-division form (`//` is
    * DuckDB integer division, matching Spark's `div`) so BOTH engines
    * stay overflow-free at any SF — the earlier multiply form wrapped
    * silently on the Spark side's int64 while DuckDB widened to
    * HUGEINT (r18 advice: asymmetric divergence, not symmetric error).
    * Pinned in RelationalSpec's per-occurrence lint allowlist. */
  def importantStockSql: String = s"""
    WITH $partsuppSqlCte,
    pp AS (SELECT ps_partkey,
                  SUM(ps_cost_cents * ps_availqty) AS value_cents
           FROM partsupp GROUP BY ps_partkey),
    tot AS (SELECT SUM(value_cents) AS total_cents FROM pp)
    SELECT ps_partkey, value_cents / 100.0 AS value
    FROM pp, tot
    WHERE value_cents > total_cents // 10000
    ORDER BY value DESC, ps_partkey"""
}
