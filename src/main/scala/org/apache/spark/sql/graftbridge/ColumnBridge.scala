package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` bridge: lift a raw Catalyst `Expression` into a
  * public `Column` (Spark 4 wraps Columns in `ColumnNode`s; the converter
  * lives behind `private[sql]`). Standard practice for libraries shipping
  * native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
