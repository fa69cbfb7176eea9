/* Extension bridge: Column <-> catalyst Expression conversion for custom
 * expressions (the classic Spark-extension package-object pattern —
 * Spark 4 moved the converters behind private[sql]). */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
