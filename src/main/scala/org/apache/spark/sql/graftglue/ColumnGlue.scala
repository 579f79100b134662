package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4's `Column` wraps a
  * `ColumnNode`, and the converter (`classic.ExpressionUtils`) is
  * `private[sql]` — this one-file package-in shim re-exports the two
  * conversions the engine's custom expressions need. No other Spark
  * internals are touched.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
