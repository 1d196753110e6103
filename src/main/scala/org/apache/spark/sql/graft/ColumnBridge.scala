package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 `Column`s wrap `ColumnNode`s, not catalyst `Expression`s; the
  * two-way bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — so custom-expression libraries expose it via
  * a shim inside the sql package (the same pattern Spark's own connectors
  * use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
