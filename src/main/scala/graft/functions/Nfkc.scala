package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §2.8 F2; reference:
  * markdown_manager.py:57 `unicodedata.normalize("NFKC", ...)`).
  *
  * A plain Scala UDF would force a codegen boundary and per-row
  * serialization; this expression inlines a single static Java call
  * into the generated code, so the normalization chain stays inside one
  * WholeStageCodegen span with the surrounding regexp_replace chain.
  */
case class NfkcNormalize(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, Normalizer.Form.NFKC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""UTF8String.fromString(
          java.text.Normalizer.normalize($c.toString(),
            java.text.Normalizer.Form.NFKC))""")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object Nfkc {
  import org.apache.spark.sql.graftbridge.Bridge
  def nfkc(c: Column): Column =
    Bridge.column(NfkcNormalize(Bridge.expression(c)))
}
