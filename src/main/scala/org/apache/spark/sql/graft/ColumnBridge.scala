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
}
