package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  * Spark 4 made these conversions `private[sql]`
  * (`classic.ExpressionUtils`); declaring the bridge inside the sql
  * package is the standard pattern for third-party Catalyst extensions. */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** DataFrame ↔ LogicalPlan bridge for graft's custom operators: Spark 4
  * keeps `Dataset.ofRows` and the classic session `private[sql]`/classic-
  * typed, so constructing a DataFrame over a custom logical node (and
  * registering the planner strategy that lowers it) needs this in-package
  * shim. `addStrategy` is idempotent — `extraStrategies` is the public
  * `ExperimentalMethods` hook, the session-local alternative to the
  * `SparkSessionExtensions.injectPlannerStrategy` route GraftExtensions
  * also wires. */
object GraftPlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.SparkStrategy

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** EAGER Column → catalyst conversion. `ExpressionUtils.expression`
    * wraps the column node lazily (`ColumnNodeExpression`, Unevaluable)
    * and relies on the classic Dataset API paths to convert during
    * analysis — a custom logical node bypasses those paths and the
    * wrapper survives to codegen and throws. The classic converter
    * produces the real catalyst tree (e.g. `SortOrder` over
    * `UnresolvedAttribute`) that the analyzer then resolves in place. */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // contains/append is check-then-act on shared session state: two
    // threads registering concurrently could lose one strategy (its
    // custom node then reaches the planner unlowered) or double-append.
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(s))
        cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}

/** Streaming restart-rehearsal bridge: drop every cached state-store
  * provider from this JVM, so the NEXT micro-batch of a restarted query
  * must RELOAD its state from checkpoint files — locally simulating
  * executor death between two lives of a stateful query. Without this,
  * the in-JVM provider cache serves the "restarted" query from memory
  * and a recovery certification proves nothing. */
object GraftStreamingBridge {
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
