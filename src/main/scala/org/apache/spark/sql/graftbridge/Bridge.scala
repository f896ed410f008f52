package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4's unified Column API hides the
  * classic `ExpressionUtils` behind `private[sql]`; custom Catalyst
  * expressions (graft.functions.*) still need to surface as `Column`s.
  * Living under `org.apache.spark.sql` grants that access — the one
  * package-private reach-in in this codebase, kept to two one-liners.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
