package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the standard
  * pattern for libraries shipping custom Catalyst expressions against
  * Spark 4's ColumnNode-based public Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function builder on a live session (the registry is
    * `private[sql]` on the classic session). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The LAST micro-batch's executed physical plan of a (terminated or
    * running) streaming query — the only way to assert plan shape (e.g.
    * "the dimension side of a stream-static join is broadcast") for
    * micro-batch execution, which re-plans per batch behind `private[sql]`
    * machinery. */
  def lastStreamingExecutedPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery): execution.SparkPlan =
    q.asInstanceOf[execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
}
