package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 routes Column construction through ColumnNodes and
  * keeps the Expression⇄Column converters `private[sql]`, so this one-file shim
  * lives under `org.apache.spark.sql` — the standard pattern for third-party
  * extensions that ship native expressions.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
