package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two DOUBLE arrays as a native Catalyst expression
  * with whole-stage codegen — the scoring primitive of every
  * brute-force vector scan (R1/R2, LSH re-rank, near-dup pairs).
  *
  * The higher-order formulation `aggregate(zip_with(a,b,*), 0, +)` is
  * correct but CodegenFallback: each row allocates a zipped array and
  * evaluates two lambdas per element interpreted. This expression
  * compiles to a tight primitive loop inside the scan's codegen stage —
  * the form a columnar engine would emit. Summation is the SAME
  * sequential left-to-right order as the higher-order fold and DuckDB's
  * `list_dot_product`, so scores stay bit-identical to the oracle.
  *
  * Contract: non-null elements (embedding vectors), equal lengths (the
  * shorter length bounds the loop, matching zip_with-on-equal-lengths).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers cast both sides to array<double> explicitly (VectorOps
  // .asDouble); AbstractDataType is private[sql] in Spark 4, so input
  // coercion via ExpectsInputTypes is not available outside org.apache —
  // instead the types are HARD-CHECKED at analysis time: getDouble on an
  // UnsafeArrayData of floats/ints would misread raw bytes silently
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    DotProduct.checkDoubleArrays(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance, same design and ordering contract as
  * [[DotProduct]] (sequential Σ (aᵢ−bᵢ)², bit-identical to the
  * zip_with fold and the oracle's per-element transform). */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_squared"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    DotProduct.checkDoubleArrays(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge.Bridge
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))

  /** Both children must already be array<double> — enforced at analysis
    * time so a SQL caller passing the raw array<float> embeddings column
    * gets an AnalysisException, not silently-garbage byte reads. The SQL
    * registry builders ([[GraftFunctions]]) insert an explicit Cast so
    * well-typed numeric arrays still coerce. */
  private[functions] def checkDoubleArrays(name: String,
      left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<double>, array<double>) inputs, got " +
          s"(${l.catalogString}, ${r.catalogString}); cast embeddings first")
    }
}
