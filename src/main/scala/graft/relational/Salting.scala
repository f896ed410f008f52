package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §2.3 / the 100 TB
  * discipline: "skewed keys → salting or AQE skew-join").
  *
  * For a join where `big` has heavy hitters on the join key: the big
  * side gets a random-but-deterministic salt in [0, nSalts), the small
  * side is exploded nSalts× so every (key, salt) pair exists, and the
  * join runs on (key, salt) — splitting each hot key's rows across
  * nSalts reducers. Deterministic salt (hash of all columns) keeps the
  * operation reproducible; results are identical to the unsalted join
  * (asserted in SaltingSpec).
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled, on by
  * default) handles the sort-merge case automatically at runtime; this
  * explicit form is for aggregate-style skew and engines/joins AQE
  * can't split.
  */
object Salting {

  /** Deterministic pseudo-random salt derived from the row content. */
  private def salt(nSalts: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(nSalts))

  /** Salted equi-join of a skewed big side against a small side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int = 8): DataFrame = {
    val bigS = big.withColumn("__salt", salt(nSalts, big.columns.map(col).toSeq))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial agg on (key, salt), final on
    * key — the classic hot-key count/sum decomposition. */
  def saltedCount(df: DataFrame, key: String, nSalts: Int = 8): DataFrame =
    df.withColumn("__salt", salt(nSalts, df.columns.map(col).toSeq))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
