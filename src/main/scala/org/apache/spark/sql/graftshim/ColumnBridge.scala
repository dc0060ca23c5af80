package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` backend-agnostic (it wraps a `ColumnNode`, not an
  * `Expression`), and the classic converter lives behind `private[sql]`.
  * The engine's native expressions (graft.plans) need both directions to
  * offer a typed `Column` API without going through the SQL parser, so
  * this one-file shim lives in the `org.apache.spark.sql` namespace to
  * reach `ExpressionUtils`. No Spark internals are modified or shadowed.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a (classic-backend) Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic backend). Used by the
    * libm boundary-canary sweep to execute a registered query's final
    * stage with its `round(...)` wrappers stripped — measuring how far
    * each unrounded cell sits from a rounding boundary. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
