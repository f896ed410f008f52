package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining TPC-H query shapes (Q8/Q9/Q12/Q13/Q15/Q16/Q17/Q19/
  * Q20/Q21/Q22) as analogs over the available star-schema columns.
  *
  * The testdata ships no commitdate/receiptdate/shipmode/container/
  * phone columns, so those attributes are DERIVED with deterministic
  * integer arithmetic from the keys (same formulas in the DuckDB
  * oracle) — the point of each query is its relational SHAPE (the join
  * topology, the decorrelation rewrite, the aggregation pattern), which
  * is what has to survive a 100 TB scale-up:
  *
  *  - dimension tables broadcast; fact⋈fact joins shuffle once on the
  *    join key with map-side partial aggregation;
  *  - correlated subqueries are rewritten to groupBy+join (Q17, Q20) or
  *    to a single-pass conditional aggregation per group (Q21 — the
  *    classic exists/not-exists double self-join collapses into ONE
  *    shuffle of lineitem by orderkey);
  *  - money stays in integer centi-cents (price_cents × (100−disc_pct))
  *    until the final projection, so every aggregate is order-free
  *    exact and hash-stable (see graft.Exact for the rationale).
  */
object TpchDeep {

  // --- derived-attribute algebra (mirrored verbatim in the oracle) ---

  /** 2-decimal money → exact integer cents. round() kills the float
    * representation error (x*100 = …99999/…00001); floor() makes the
    * double→long conversion explicit TRUNCATION on both engines
    * (DuckDB CAST(double AS BIGINT) rounds, Spark truncates — see
    * NOTES.md hash-stability playbook #7). */
  private def cents(c: Column): Column = floor(round(c * 100))
  private def centsSql(e: String) = s"CAST(FLOOR(ROUND(($e)*100)) AS BIGINT)"

  /** Discount as integer percent (testdata discounts are 0.00–0.10). */
  private val discPct: Column = floor(round(col("l_discount") * 100))
  private val discPctSql = "CAST(FLOOR(ROUND(l_discount*100)) AS BIGINT)"

  /** Line volume in centi-cents: cents × (100 − disc%). Exact BIGINT;
    * ÷10000.0 at the very end is one deterministic IEEE division. */
  private val volCc: Column = cents(col("l_extendedprice")) * (lit(100) - discPct)
  private val volCcSql = s"${centsSql("l_extendedprice")} * (100 - $discPctSql)"

  /** Derived ship mode (the schema has none): keyed off the line
    * identity so it is stable across engines and scale factors. */
  private val shipMode: Column = element_at(
    array(lit("MAIL"), lit("SHIP"), lit("RAIL"), lit("TRUCK"), lit("AIR")),
    ((col("l_orderkey") * 3 + col("l_linenumber")) % 5 + 1).cast("int"))
  private val shipModeSql =
    "(['MAIL','SHIP','RAIL','TRUCK','AIR'])[CAST((l_orderkey*3 + l_linenumber) % 5 + 1 AS INT)]"

  /** Derived lateness: receipt delay vs commit delay in days from the
    * ship date. Only the COMPARISON matters to Q12/Q21, so the delays
    * stay integers and no date arithmetic is needed. */
  private val lateLine: Column =
    (col("l_orderkey") * 7 + col("l_linenumber") * 11) % 30 >
      (col("l_orderkey") * 3 + col("l_linenumber") * 5) % 30
  private val lateLineSql =
    "(l_orderkey*7 + l_linenumber*11) % 30 > (l_orderkey*3 + l_linenumber*5) % 30"

  private def year(c: Column): Column = org.apache.spark.sql.functions.year(c).cast("long")

  /** Q8: market share of one supplying nation inside one consuming
    * region, by order year. Every dimension (part, customer-side
    * snowflake, supplier→nation) broadcasts; lineitem⋈orders is the
    * only fact shuffle; the share is a division of two exactly-summed
    * BIGINTs. Reference shape: TPC-H Q8 (national market share). */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaNationKeys = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val asiaCustomers = Tables.customer(spark, dir)
      .join(broadcast(asiaNationKeys), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Relational.broadcastIfSmall(Tables.part(spark, dir).filter(col("p_type") === "STANDARD")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Relational.broadcastIfSmall(asiaCustomers), col("o_custkey") === col("c_custkey"))
      .join(Relational.broadcastIfSmall(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", volCc).otherwise(lit(0L))).as("nation_cc"),
        sum(volCc).as("total_cc"))
      .select(col("o_year"),
        (col("nation_cc").cast("double") / col("total_cc").cast("double")).as("mkt_share"),
        (col("total_cc") / lit(10000.0)).as("total_volume"))
      .orderBy(col("o_year"))
  }

  def marketShareSql: String = s"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_7' THEN $volCcSql ELSE 0 END) AS DOUBLE)
             / CAST(SUM($volCcSql) AS DOUBLE) AS mkt_share,
           SUM($volCcSql) / 10000.0 AS total_volume
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1 ORDER BY 1"""

  /** Q9: product-type profit by supplying nation and year. Supply cost
    * = the part's CHEAPEST synthesized-partsupp offer (per-part min —
    * deterministic, and the economically meaningful cost basis).
    * profit stays in integer centi-cents:
    * cents×(100−disc%) − min_cents×qty×100. The min-cost side is a
    * plain equi-join (AQE broadcasts it at small SF; at TPC-H scale
    * part grows with SF so the shuffle join is the right default). */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val boltParts = Tables.part(spark, dir).filter(col("p_name").contains("bolt"))
    // guide §3.2 (reduce the big side before shuffling it): the min-cost
    // aggregate only matters for 'bolt' parts, so semi-filter partsupp
    // by the SAME selective part set the fact join broadcasts — the
    // filter commutes with the per-partkey MIN (it is on the group key
    // alone), so the surviving rows are value-identical. minCost is now
    // bounded by the filtered part dimension; the semi-filter is the
    // unconditional scale win (lineitem is never shuffled by partkey —
    // before, the plan leaned on AQE's size estimate of the unfiltered
    // per-part aggregate, corpus-sized at real TPC-H SF, where this
    // join would have become lineitem's second fact exchange). The
    // broadcast HINTS on the bolt/minCost sides are size-GUARDED
    // (broadcastIfSmall): 'bolt' still selects a fixed fraction of a
    // part table that grows with SF, so past the guard's ceiling the
    // hint is withheld and the planner/AQE picks the strategy from
    // real sizes instead of being forced into a driver-OOM attempt.
    // One fact shuffle remains: lineitem⋈orders.
    val minCost = Relational.partsupp(spark, dir)
      .join(Relational.broadcastIfSmall(boltParts.select(col("p_partkey").as("ps_partkey"))),
        Seq("ps_partkey"), "left_semi")
      .groupBy(col("ps_partkey")).agg(min(col("ps_cost_cents")).as("min_cents"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .join(Relational.broadcastIfSmall(boltParts), col("l_partkey") === col("p_partkey"))
      .join(Relational.broadcastIfSmall(minCost), col("l_partkey") === col("ps_partkey"))
      .join(Relational.broadcastIfSmall(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(volCc - col("min_cents") * col("l_quantity").cast("long") * 100).as("profit_cc"))
      .select(col("nation"), col("o_year"), (col("profit_cc") / lit(10000.0)).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  def productProfitSql: String = s"""
    WITH ${Relational.partsuppSqlCte},
    mc AS (SELECT ps_partkey, MIN(ps_cost_cents) AS min_cents FROM partsupp GROUP BY ps_partkey)
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           SUM($volCcSql - min_cents * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
    JOIN mc ON l_partkey = ps_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2 ORDER BY nation, o_year DESC"""

  /** Q12: late-line priority census by (derived) ship mode in one ship
    * year. One orders⋈lineitem shuffle; the priority split is a
    * conditional partial aggregate. */
  def shipModePriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .filter(lateLine)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(shipMode.as("shipmode"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("shipmode"))

  def shipModePrioritySql: String = s"""
    SELECT $shipModeSql AS shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND $lateLineSql
    GROUP BY 1 ORDER BY 1"""

  /** Q13: distribution of orders-per-customer, zero-order customers
    * included (left outer join, count of the nullable side). Two
    * shuffles by construction: custkey, then the histogram key. */
  def custDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  def custDistributionSql: String = """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** Q15: top supplier(s) by quarterly revenue. The max is a 1-row
    * broadcast (never collected to the driver); revenue compares in
    * exact centi-cents so ties are honest. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(volCc).as("rev_cc"))
    val maxRev = rev.agg(max(col("rev_cc")).as("max_cc"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev_cc") === col("max_cc"))
      .join(Relational.broadcastIfSmall(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), (col("rev_cc") / lit(10000.0)).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  def topSupplierSql: String = s"""
    WITH rev AS (
      SELECT l_suppkey, SUM($volCcSql) AS rev_cc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, rev_cc / 10000.0 AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_cc = (SELECT MAX(rev_cc) FROM rev)
    ORDER BY s_suppkey"""

  /** Q16: how many distinct suppliers offer each surviving
    * (brand, type, size) — partsupp⋈part with an anti-join against a
    * deterministic "complaint" supplier set (the schema has no
    * comments to grep). countDistinct shuffles once on the group key. */
  def partSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_suppkey") % 97 === 0).select(col("s_suppkey"))
    Relational.partsupp(spark, dir)
      .join(Relational.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
        col("ps_partkey") === col("p_partkey"))
      .join(Relational.broadcastIfSmall(complaints), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  def partSupplierCountsSql: String = s"""
    WITH ${Relational.partsuppSqlCte}
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON ps_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 97 = 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q17: revenue lost to small-quantity orders. The correlated
    * avg-quantity subquery decorrelates to groupBy+join, and the
    * 0.2×avg comparison is cleared of division:
    * qty < sum/n/5  ⇔  5·qty·n < sum (quantities are integral). */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Relational.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_cents"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_li"))
    li.join(perPart, Seq("l_partkey"))
      .filter(col("qty") * col("n_li") * 5 < col("sum_qty"))
      .agg(
        coalesce(sum(col("price_cents")), lit(0L)).as("cc"),
        count(lit(1)).as("n_lines"))
      .select((col("cc") / lit(700.0)).as("avg_yearly"), col("n_lines"))
  }

  def smallQtyRevenueSql: String = s"""
    WITH li AS (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             ${centsSql("l_extendedprice")} AS price_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3' AND p_size <= 10),
    pp AS (SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_li FROM li GROUP BY l_partkey)
    SELECT COALESCE(SUM(price_cents), 0) / 700.0 AS avg_yearly, COUNT(*) AS n_lines
    FROM li JOIN pp USING (l_partkey)
    WHERE qty * n_li * 5 < sum_qty"""

  /** Q19: disjunctive brand/size/quantity predicate — one broadcast
    * join, the whole OR-of-ANDs evaluates inside the scan's filter. */
  def discountedRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Relational.broadcastIfSmall(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(
        (coalesce(sum(volCc), lit(0L)) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))

  def discountedRevenueSql: String = s"""
    SELECT COALESCE(SUM($volCcSql), 0) / 10000.0 AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""

  /** Q20: suppliers with surplus stock of parts they actually shipped —
    * partsupp⋈(part-filter broadcast)⋈per-(part,supplier) shipped
    * quantity, surplus test cleared of division (2·avail > shipped).
    * The correlated scalar subquery is the shipped-qty groupBy. */
  def promoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_shipped"))
    Relational.partsupp(spark, dir)
      .join(Relational.broadcastIfSmall(Tables.part(spark, dir).filter(col("p_name").startsWith("red"))),
        col("ps_partkey") === col("p_partkey"))
      .join(shipped,
        col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") * 2 > col("qty_shipped"))
      .select(col("ps_suppkey")).distinct()
      .join(Relational.broadcastIfSmall(Tables.supplier(spark, dir)), col("ps_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  def promoSuppliersSql: String = s"""
    WITH ${Relational.partsuppSqlCte},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty_shipped
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM partsupp
    JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON ps_suppkey = s_suppkey
    WHERE ps_availqty * 2 > qty_shipped
    ORDER BY s_suppkey"""

  /** Q21: suppliers who alone held up a multi-supplier order. The
    * textbook form is lineitem self-joined twice (EXISTS other-supplier
    * line, NOT EXISTS other late line); here both collapse into ONE
    * aggregation over orderkey — per order: distinct suppliers,
    * distinct LATE suppliers, and the unique late supplier when there
    * is exactly one. That is a single lineitem shuffle instead of
    * three, the rewrite that matters most at fact-table scale. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    // Stage 1: dedup to one row per (order, supplier) with a was-ever-late
    // flag. A plain max() partial-aggregates map-side, so the composite-key
    // shuffle carries at most |distinct pairs| rows — unlike the previous
    // countDistinct form, whose Expand tripled the fact table through the
    // exchange with near-zero partial reduction.
    val perPair = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), lateLine.as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    // Stage 2: per order over the deduped pairs (~4 rows/order), all plain
    // aggregates — no distinct, no Expand anywhere in the plan.
    val perOrder = perPair
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        count(when(col("late"), lit(1))).as("n_late_supp"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    perOrder
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(Relational.broadcastIfSmall(Tables.supplier(spark, dir)), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)

  }

  def waitingSuppliersSql: String = s"""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN $lateLineSql THEN l_suppkey END) AS n_late_supp,
             MIN(CASE WHEN $lateLineSql THEN l_suppkey END) AS late_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM per_order
    JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 20"""

  /** Q22: idle high-balance customers in selected "country codes"
    * (nation keys — the schema has no phone). The avg-balance scalar
    * stays a 1-row broadcast and the comparison is cleared of
    * division: bal > sum/n ⇔ bal·n > sum in exact cents. Anti-join
    * drops customers with any RECENT order (the testdata's order
    * density gives every customer some lifetime order, so "idle" is
    * time-scoped — same anti-join shape). */
  def idleBalances(spark: SparkSession, dir: String): DataFrame = {
    val pool = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(3, 8, 13, 18, 23))
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"))
    val avgPos = pool.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir).filter(col("o_orderdate") >= lit("1999-01-01"))
    pool.crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), (sum(col("bal_cents")) / lit(100.0)).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  def idleBalancesSql: String = s"""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, ${centsSql("c_acctbal")} AS bal_cents
      FROM customer WHERE c_nationkey IN (3, 8, 13, 18, 23)),
    avg_pos AS (
      SELECT SUM(bal_cents) AS sum_cents, COUNT(*) AS n_pos
      FROM pool WHERE bal_cents > 0)
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           SUM(bal_cents) / 100.0 AS totacctbal
    FROM pool, avg_pos
    WHERE bal_cents * n_pos > sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1 ORDER BY 1"""
}
