package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions.
  *
  * Spark 4 moved `Column.expr` / `new Column(expr)` behind `private[sql]`;
  * the supported pattern for extension libraries that define custom
  * Catalyst expressions is a shim in an `org.apache.spark.sql` subpackage
  * (as Delta, Sedona, et al. do). This is the single file in this repo
  * outside the `graft` namespace.
  */
object ColumnBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder so the function is usable from SQL. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
