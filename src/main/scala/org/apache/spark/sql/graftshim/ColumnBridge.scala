package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) `private[sql]`, so a library that builds
  * `Column`s over its own native `Expression`s (the brief's preferred
  * custom-operator tier) needs this one-file shim inside the sql package
  * tree — the same technique every Spark extension library uses. No
  * Spark internals are modified; this only re-exports two converters.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
