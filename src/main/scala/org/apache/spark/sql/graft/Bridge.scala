package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The engine's single, minimal window into Spark's `private[sql]` plan
  * machinery — the same technique every production Spark connector uses
  * for its SQL DML front door (Delta Lake's `org.apache.spark.sql.delta`
  * packages, Iceberg's `org.apache.spark.sql.catalyst` extensions):
  * a resolved `UpdateTable`/`MergeIntoTable` hands the analyzer's OWN
  * resolved plans and expressions to the command, and turning those back
  * into DataFrames/Columns without re-resolution (which would break on
  * ambiguous names between MERGE's target and source) requires
  * `Dataset.ofRows` and the Column↔Expression converters.
  *
  * Everything else in the engine stays on the public API; keep this file
  * to exactly the small capability set below.
  */
object Bridge {

  /** Wrap an analyzer-resolved logical plan as a DataFrame, preserving
    * attribute identity (exprIds) — `classic.Dataset.ofRows`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A Column carrying an already-resolved expression verbatim. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The resolved expression inside a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Parse SQL text to a catalyst expression TREE eagerly. Spark 4's
    * `functions.expr` defers parsing inside a ColumnNode wrapper, so
    * consumers that pattern-match the tree (scan-planning candidate
    * pruning) need the session parser directly. */
  def parseExpression(spark: SparkSession, sql: String): Expression =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
      .parseExpression(sql)

  /** Block until the listener bus has delivered every queued event —
    * `graft.Bench` reads task-metric accumulations (executorCpuTime)
    * right after an action, and the bus is asynchronous. private[spark]
    * surface, hence here. */
  def drainListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
