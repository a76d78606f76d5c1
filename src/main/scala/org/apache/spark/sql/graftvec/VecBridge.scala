package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * private[sql] (the Connect refactor routes Columns through
  * ColumnNodes), so the one place that needs them — exposing our
  * codegen'd expressions as Columns — lives in this package, the
  * conventional extension point used by Spark expression libraries.
  */
object VecBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
