package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: converting between
  * `Column` and catalyst `Expression` so graft's native expressions can
  * be used from the public DataFrame API. Spark 4 routes Column through
  * ColumnNode (Connect refactor); `classic.ExpressionUtils` is the
  * supported classic-session conversion and is package-private to sql —
  * hence this one-file residence in the sql package namespace. Nothing
  * else internal is touched.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
