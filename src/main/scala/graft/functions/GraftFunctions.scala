package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL registration for the custom Catalyst functions, so
  * `spark.sql("SELECT nfkc(text), chunk_split(text, 200, 50) ...")`
  * works alongside the Column API (SURVEY.md §2.13: FunctionRegistry
  * exposure of the engine's extensions).
  *
  * Two paths:
  *  - [[GraftFunctions.register]] on a live session;
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) at session build time.
  */
object GraftFunctions {

  // SQL callers hold array<float> embeddings; DotProduct/L2Squared
  // hard-require array<double> (their getDouble would misread other
  // element widths), so the registry path coerces explicitly. Casting
  // an already-double array is folded away by SimplifyCasts.
  private[functions] def asDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  private def entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc"),
      (exprs: Seq[Expression]) => NfkcNormalize(exprs.head)),
    (FunctionIdentifier("chunk_split"),
      new ExpressionInfo(classOf[ChunkSplit].getName, "chunk_split"),
      (exprs: Seq[Expression]) => ChunkSplit(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))),
    (FunctionIdentifier("l2_squared"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
      (exprs: Seq[Expression]) => L2Squared(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))),
  )

  /** Register on a live session's function registry. */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, ident, info, builder)
    }
}

/** Session-extensions installer: the custom functions + the NFKC
  * idempotence optimizer rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions.asDoubleArray
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NfkcIdempotence)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((FunctionIdentifier("nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc"),
      (exprs: Seq[Expression]) => NfkcNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("chunk_split"),
      new ExpressionInfo(classOf[ChunkSplit].getName, "chunk_split"),
      (exprs: Seq[Expression]) => ChunkSplit(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("l2_squared"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
      (exprs: Seq[Expression]) => L2Squared(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))))
  }
}
