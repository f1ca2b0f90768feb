package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's private[sql] Column<->Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 wraps
  * Columns in ColumnNodes; building a Column from a custom Catalyst
  * Expression requires this hop, which upstream keeps private[sql] —
  * hence this shim living under the org.apache.spark.sql package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (Dataset.ofRows is
    * private[sql] in Spark 4) — needed to expose custom logical
    * operators through the public DataFrame API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Free the storage blocks behind a `localCheckpoint()`ed Dataset.
    * `Dataset.unpersist` only talks to the CacheManager; checkpoint
    * blocks are RDD-level persists reachable only through the plan's
    * LogicalRDD leaf. Without this, iterative algorithms pin every
    * superseded iteration in executor storage memory until GC happens
    * to collect the Dataset (ContextCleaner is async + GC-driven). */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** The RDD ids backing a checkpointed Dataset's LogicalRDD leaves —
    * lets a harness-level storage sweep EXEMPT frames a live memo
    * still references (ripping their blocks out produces
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the next replay; the
    * pre-blocking sweep only ever won that race by accident). */
  def checkpointRddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
}
