package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the Column ⇄ Catalyst-Expression conversion, which Spark 4 keeps
  * `private[sql]` (columnNodeSupport.scala). Lives in the spark.sql package namespace
  * solely to re-export those two methods for graft's custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
