package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters (the classic
  * backend's supported conversion since Spark 4 removed the public
  * `new Column(expr)` constructor). Lives in the sql package namespace
  * solely to satisfy the access modifier; one line each, no behavior.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Test-facing probe for the `private[sql]` cache registry — lets specs
  * assert cache-entry counts (CacheScope lifecycle) without reflection.
  */
object CacheProbe {
  def numCachedEntries(spark: org.apache.spark.sql.SparkSession): Int =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.numCachedEntries
}

/** Test-facing probe for a streaming query's last executed micro-batch
  * physical plan (`private[sql]` StreamExecution internals) — lets the
  * streaming scale lint walk real executed plans, not plan strings.
  */
object StreamProbe {
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.execution.SparkPlan =
    q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
}
