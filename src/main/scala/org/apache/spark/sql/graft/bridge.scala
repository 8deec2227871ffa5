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

  /** Drain the listener bus so a SparkListener's per-query counters
    * (Bench's shuffle-bytes / peak-memory budgets) are complete before
    * they are read — task-end events post asynchronously and the last
    * batch can otherwise land after the timer stops. `listenerBus` is
    * `private[spark]`; this is the only internal touched.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Register a function builder on a LIVE session's function registry
    * (the post-construction analog of `SparkSessionExtensions
    * .injectFunction`, which only applies at session build). Same
    * `private[sql]` rationale as the Column conversions above.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder)
}
