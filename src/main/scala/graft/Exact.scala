package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hash-stable numeric aggregation.
  *
  * The driver hash-compares Spark results against a DuckDB oracle
  * (SURVEY.md §5). A plain `SUM(double)` is order-dependent in its last
  * ulps, and Spark's parallel partial aggregation sums in a different
  * order than DuckDB's scan — so two "correct" answers can hash
  * differently. The testdata's numerics are fixed-point (2-decimal money,
  * integral quantities), so we sum them as exact decimals and only then
  * cast to double: the decimal sum is order-independent and the final
  * decimal→double rounding is deterministic IEEE, giving bit-identical
  * doubles on both engines. Oracle SQL mirrors this with
  * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
object Exact {
  /** Order-independent double sum of a fixed-point column. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean: exact decimal sum, IEEE division by the count. */
  def exactAvg(c: Column, scale: Int = 2): Column =
    exactSum(c, scale) / count(lit(1))

  /** SQL fragment for the oracle side of [[exactSum]]. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlAvg(expr: String, scale: Int = 2): String =
    s"(${sqlSum(expr, scale)} / COUNT(*))"
}
