package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion, so custom
  * native Catalyst expressions (graft.functions.expr) can be exposed as
  * regular `Column`s. Lives in the spark.sql package solely to satisfy
  * the access modifier; no Spark internals are modified. */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
