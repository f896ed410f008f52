package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file parallelism guard.
  *
  * The `documents` table is a single tiny parquet file, so Spark scans
  * it as ONE partition — and every compute-heavy per-row stage (minhash
  * md5s, shingling, tokenize+explode) serializes on one core. At real
  * scale the input is thousands of splits and this is a no-op (we check
  * first — never an unconditional repartition, which would *add* a
  * shuffle at 100 TB); locally it restores the 32-way parallelism the
  * cluster would have.
  */
object Parallelism {
  def ensure(spark: SparkSession)(df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
