package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building [[Column]]s from custom Catalyst [[Expression]]s
  * (the converters live behind `private[sql]` in Spark 4's classic
  * module, so this one-liner lives in the sql package). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
