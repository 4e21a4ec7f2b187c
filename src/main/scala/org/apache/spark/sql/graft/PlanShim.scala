package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal `private[sql]` bridge for the engine's prepared-statement
  * path (the same package-shim pattern public Spark extensions such as
  * Delta Lake use). Two capabilities, both standard Catalyst:
  *
  *  - [[ofRows]] — wrap an already-analyzed (here: already-OPTIMIZED)
  *    logical plan in a fresh DataFrame. Re-wrapping per action keeps
  *    Exchange nodes fresh, so every execution recomputes its shuffles —
  *    re-executing a memoized RDD would silently serve stage outputs
  *    from the previous run's map files and measure nothing. The fresh
  *    QueryExecution's lazy phases DO re-run the analyzer + optimizer
  *    over the cached tree; correctness therefore assumes the optimizer
  *    is a fixpoint on its own output. Spark does not contractually
  *    promise that, so it is gated empirically: BenchActionSpec pins
  *    prepared-plan actions against `df.count()`, and every oracle run
  *    executes the statement-cached builders through this path.
  *  - [[optimizedPlan]] — force a frame's analysis + optimization once
  *    and return the optimized logical plan, the thing a warehouse's
  *    statement cache actually stores.
  */
object PlanShim {

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classic(spark), plan)

  def optimizedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  /** A fresh QueryExecution over `plan` (fresh physical planning →
    * fresh shuffle ids), without constructing a Dataset.
    */
  def execute(spark: SparkSession, plan: LogicalPlan): QueryExecution =
    classic(spark).sessionState.executePlan(plan)
}
