package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** The Column ↔ Expression seam for custom Catalyst expressions.
  * Spark 4 made this conversion `private[sql]`, so the bridge lives in an
  * `org.apache.spark.sql` subpackage — the standard shape for extension
  * libraries that ship native expressions.
  */
object ColumnBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Imperative registration into an existing session (the
    * SparkSessionExtensions route needs to be configured before session
    * construction; this one works on any live session — e.g. the
    * driver-owned harness session).
    */
  def registerFunction(spark: SparkSession, name: String,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
