package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridges graft's native Catalyst expressions into the public Column API.
  * Spark 4 made Column <-> Expression conversion private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-file shim
  * lives inside the sql package namespace; everything else in this library
  * stays in graft.*.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
