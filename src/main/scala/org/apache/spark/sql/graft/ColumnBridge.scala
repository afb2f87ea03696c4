package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 made the Column↔Expression converters `private[sql]`
  * (columnNodeSupport.scala); a library adding native Catalyst expressions
  * needs this one-hop bridge compiled into the `org.apache.spark.sql`
  * namespace — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
