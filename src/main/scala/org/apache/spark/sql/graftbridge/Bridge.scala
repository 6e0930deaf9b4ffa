package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's package-private Column <-> Expression
  * converters (Spark 4.x moved Column to a ColumnNode facade; the classic
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * `private[sql]`). Living inside the `org.apache.spark.sql` package tree is
  * the standard extension-library pattern for this.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
