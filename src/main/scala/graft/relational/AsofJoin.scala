package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal AS-OF join — each left row matched to the LATEST right row
  * at-or-before its timestamp (or earliest at-or-after, `forward`),
  * optionally within a tolerance: the pandas `merge_asof` / kdb `aj`
  * operator Spark has no built-in for.
  *
  * NOT implemented as a range join: a (key, l.ts ≥ r.ts) θ-join
  * explodes to every prior right row per left row and then needs a
  * max-per-group — quadratic in dense keys. The one-pass form: union
  * both sides tagged, ONE window per key ordered by (ts, side, tie),
  * carry the last right-side payload forward (`last(..., ignoreNulls)`
  * over unbounded-preceding), keep left rows. Cost is one shuffle on
  * the key and a linear pass per key — the same plan shape at 60k rows
  * and at 100 TB (per-key skew is the watermark-state analog: one key's
  * timeline lands in one task).
  *
  * At equal timestamps the right row sorts FIRST (side 0 < 1), so the
  * match is inclusive (at-or-before / at-or-after). Ties BETWEEN right
  * rows at one (key, ts) resolve by `tieBreak` ascending — the carried
  * payload is the last one, i.e. the greatest tie-break value; pass a
  * unique column (an event id) for determinism. */
object AsofJoin {

  /** `leftTs`/`rightTs` must be the same orderable type; the right
    * side's payload columns arrive as a nullable struct column named
    * `asof` (null = no match; filter or flatten as needed).
    * `toleranceUs` applies when the ts columns are timestamps. */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, tieBreak: String,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(on.contains).toSeq
    val rPacked = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        col(tieBreak).as("__tie"),
        struct(payloadCols.map(col): _*).as("__r"),
        lit(0).as("__side")): _*)
    val rType = rPacked.schema("__r").dataType
    val lPacked = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", col(tieBreak))
      .withColumn("__r", lit(null).cast(rType))
      .withColumn("__side", lit(1))
      .select(rPacked.columns.map(col).toSeq ++
        left.columns.filterNot(c => on.contains(c)).map(col): _*)
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col("__ts").asc, col("__side").asc, col("__tie").asc)
      else Seq(col("__ts").desc, col("__side").asc, col("__tie").desc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPacked.unionByName(rPacked, allowMissingColumns = true)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(when(col("__side") === 0, col("__ts")),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gapOk = toleranceUs match {
      case None => lit(true)
      case Some(t) if direction == "backward" =>
        unix_micros(col("__ts")) - unix_micros(col("asof_ts")) <= t
      case Some(t) =>
        unix_micros(col("asof_ts")) - unix_micros(col("__ts")) <= t
    }
    carried
      .withColumn("asof", when(col("asof_ts").isNotNull && gapOk, col("asof")))
      .drop("__ts", "__tie", "__r", "__side", "asof_ts")
  }
}
