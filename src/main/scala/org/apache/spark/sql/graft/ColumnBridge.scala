package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 made `Column` an opaque ColumnNode wrapper; the conversion
  * helpers (`classic.ExpressionUtils`) are `private[sql]`, so a
  * library that builds Columns from its own native expressions
  * (NgramsF & friends) needs this one-object shim compiled into the
  * `org.apache.spark.sql` namespace — the same access route Spark
  * extension libraries (Delta, Sedona, ...) use. No Spark internals
  * are modified; this only re-exports two conversions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an already-analyzed logical plan, attribute ids
    * preserved — how the row-level DML commands re-enter the target /
    * source relations their resolved expressions reference
    * (`classic.Dataset.ofRows` is `private[sql]`, same access story
    * as the Column conversions above). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
