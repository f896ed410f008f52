package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over a driver-provided scale-factor directory
  * (TESTDATA.md). Plain `spark.read.parquet` so Catalyst gets pushdown,
  * pruning and vectorized reads for free — at cluster scale these would
  * be partitioned/bucketed external tables, but the read surface is the
  * same declarative scan either way.
  */
object Tables {
  /** Parquet FOOTER SCHEMA memo, keyed by file path. Without a
    * user-supplied schema every `spark.read.parquet` resolves its
    * relation through schema inference, which on Spark 4 dispatches a
    * one-task "parquet at ..." job — job-traced at ~5–8 such jobs per
    * TPC-H-family gate invocation (one per table REFERENCE, repeats
    * included), i.e. a fixed dispatch tax on every bench run that has
    * nothing to do with the query. The memo caches the inferred
    * StructType once per path and passes it back via `.schema(...)`,
    * which skips inference entirely. METADATA ONLY: the rows of every
    * invocation are still read from the parquet files (same scan, same
    * pushdown, byte-identical plans — the fingerprint does not see who
    * supplied the schema); this is the same class of cache as Spark's
    * own session FileStatusCache. Keyed by full path so different SF
    * dirs never collide; the driver's testdata is immutable per path. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** The memoized footer schema of `path` (inferring it once on miss).
    * For gate-stable paths only — memoized-fixture roots, the SF-dir
    * tables — NOT per-invocation temp dirs, which would grow the memo
    * without ever hitting. Callers that read under a session conf that
    * changes inference (events' nanosAsLong) must set it before the
    * first call for that path, exactly as they already must for a
    * plain read. */
  private[graft] def cachedSchema(spark: SparkSession, path: String)
      : org.apache.spark.sql.types.StructType =
    schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    spark.read.schema(cachedSchema(spark, path)).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` normalized to a microsecond TIMESTAMP whatever the
    * generator encoded: TIMESTAMP(NANOS) files (which Spark's
    * vectorized reader rejects) arrive as a nanos long via the legacy
    * conf and are TRUNCATED ns→µs — the same truncation DuckDB's
    * epoch_us applies; TIMESTAMP(MICROS) files (what the generator
    * writes now) arrive as TIMESTAMP_NTZ and cast to the session-TZ
    * timestamp, a wall-clock identity under the UTC session every
    * entrypoint pins — so both engines see identical values on either
    * encoding. [[normalizeEventTs]] is the one place this dispatch
    * lives; the streaming readers reuse it. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(spark, dir, "events"))
  }

  /** See [[events]]: `ts` → microsecond TimestampType for every
    * encoding the driver's generator has used (nanos-long, NTZ-micros,
    * or already a timestamp). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.apply("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
