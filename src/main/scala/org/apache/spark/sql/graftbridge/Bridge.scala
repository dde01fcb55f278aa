package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 wraps Columns around ColumnNodes, and the Expression↔Column
  * converters live in `sql.classic` with private[sql] visibility — the
  * standard extension-point bridge for registering custom Catalyst
  * expressions from library code (same pattern OSS connector libraries
  * use).
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
