package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StructType}

/** The retrieval scalars as catalog functions: `cosine_sim(a, b)` and
  * `l2_dist(a, b)` over float/double array columns, so plain SQL on a
  * stock session can rank a vector store by name —
  * `ORDER BY graft.g.cosine_sim(embedding, q) DESC LIMIT k` — the
  * reference's retrieval surface
  * (/root/reference/src/managers/index_manager.py:110-116) fully
  * name-addressed with no session extensions. The math is the twin of
  * the codegen expressions behind the DataFrame path
  * ([[graft.functions.DotProduct]]/[[graft.functions.L2Squared]]):
  * one sequential left-to-right accumulation loop, so scores stay
  * bit-identical to that path and to DuckDB's `list_dot_product`
  * fold. The bound function carries each side's element width
  * (float vs double) — `ArrayData.getDouble` on a float-backed array
  * would misread raw bytes, the same hazard DotProduct hard-checks.
  *
  * Execution goes through the MAGIC METHOD (`invoke`): Spark plans
  * [[org.apache.spark.sql.catalyst.expressions.objects.Invoke]] over
  * the bound instance, which whole-stage codegen compiles to a direct
  * call — no per-row reflection, no Row boxing of the arrays. */
private[catalog] final class GraftVectorUnbound(fn: String) extends UnboundFunction {

  override def name(): String = fn

  override def description(): String = fn match {
    case "cosine_sim" => "cosine_sim(a, b) -> dot(a,b)/(|a|*|b|) over float/double arrays"
    case _ => "l2_dist(a, b) -> sqrt(sum((a_i-b_i)^2)) over float/double arrays"
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"$fn takes (array, array); got ${inputType.simpleString}")
    def widthOf(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new UnsupportedOperationException(
        s"$fn: unsupported input type ${other.simpleString} " +
          "(array<float> or array<double> only)")
    }
    new GraftVectorBound(fn,
      widthOf(inputType.fields(0).dataType),
      widthOf(inputType.fields(1).dataType))
  }
}

private[catalog] final class GraftVectorBound(fn: String,
    aFloat: Boolean, bFloat: Boolean) extends ScalarFunction[java.lang.Double] {

  override def inputTypes(): Array[DataType] = Array(
    ArrayType(if (aFloat) FloatType else DoubleType),
    ArrayType(if (bFloat) FloatType else DoubleType))
  override def resultType(): DataType = DoubleType
  override def name(): String = fn
  override def isResultNullable: Boolean = true
  override def canonicalName(): String =
    s"graft.$fn(${if (aFloat) "float" else "double"},${if (bFloat) "float" else "double"})"

  private def at(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** The engine's codegen entry point; null input → null result (the
    * planner calls with propagateNull off for magic methods). */
  def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    if (fn == "cosine_sim") {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      while (i < n) {
        val x = at(a, i, aFloat)
        val y = at(b, i, bFloat)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    } else {
      var s = 0.0
      while (i < n) {
        val d = at(a, i, aFloat) - at(b, i, bFloat)
        s += d * d
        i += 1
      }
      java.lang.Double.valueOf(math.sqrt(s))
    }
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(
      if (input.isNullAt(0)) null else input.getArray(0),
      if (input.isNullAt(1)) null else input.getArray(1))

  override def toString: String = canonicalName()
}
