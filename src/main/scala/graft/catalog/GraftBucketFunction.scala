package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** The catalog's `bucket(n, key)` function — `pmod(murmur3_hash(key),
  * n)`, byte-identical to the expression [[graft.sources.SnapshotTable
  * .compactBucketed]] assigns files with (`functions.hash` IS
  * `Murmur3Hash` at seed 42, and the pmod below is SQL `pmod`). The
  * function exists so Spark's storage-partitioned-join machinery can
  * resolve the `bucket` transform the DSv2 scan reports in its
  * `KeyGroupedPartitioning`: `V2ExpressionUtils` loads it from the
  * table's [[org.apache.spark.sql.connector.catalog.FunctionCatalog]],
  * compatibility between two scans compares [[BoundFunction
  * .canonicalName]] (type-qualified, so an int-keyed table never
  * false-matches a long-keyed one — murmur3 hashes them differently),
  * and when partition values must be recomputed (missing-partition
  * push-down), [[ScalarFunction.produceResult]] re-derives ids with
  * exactly the writer's function. Iceberg ships the same shape
  * (its SparkFunctions bucket); this one is pinned to the engine's own
  * layout. */
private[catalog] object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col) -> pmod(murmur3_hash(col), n): the bucketed layout's " +
      "file assignment (int/bigint/string keys)"

  /** Spark binds bucket transforms as (numBuckets INT, key). */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields.head.dataType == IntegerType,
      s"bucket takes (numBuckets INT, key); got ${inputType.simpleString}")
    inputType.fields(1).dataType match {
      case dt @ (IntegerType | LongType | StringType) => new GraftBucketBound(dt)
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type ${other.simpleString} " +
          "(int/bigint/string only — the writer hashes nothing else)")
    }
  }
}

private[catalog] final class GraftBucketBound(dt: DataType)
  extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false
  /** Type-qualified: SPJ compatibility keys on this string, and
    * murmur3(5: int) != murmur3(5L: long). */
  override def canonicalName(): String = s"graft.bucket(${dt.typeName})"

  // the writer's exact hash: functions.hash = Murmur3Hash(seed=42);
  // null keys hash to the seed, matching SQL hash(NULL)
  @transient private lazy val hasher =
    Murmur3Hash(Seq(BoundReference(1, dt, nullable = true)), 42)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Int]
    Integer.valueOf(((h % n) + n) % n)
  }

  override def toString: String = canonicalName()
}
