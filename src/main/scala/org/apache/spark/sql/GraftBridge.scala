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

  /** Non-blocking read of an [[Observation]]'s metrics (the accessors are
    * `private[sql]`): waits the built-in ~100 ms grace for the async
    * listener, then returns empty — the executor polls this under its own
    * bounded deadline instead of `get`, which blocks FOREVER when the
    * observed plan never executes (a transform chain that replaces the
    * source frame with one not derived from it). Spark's own `getOrEmpty`
    * is avoided: it maps `Row.empty.schema`, which is null, so it NPEs in
    * exactly the never-fired case this read exists for. */
  def observationOrEmpty(obs: Observation): Map[String, Any] =
    obs.getRowOrEmpty match {
      case Some(row) if row.schema != null =>
        row.schema.fieldNames.zip(row.toSeq).toMap
      case _ => Map.empty
    }

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
