package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression conversion — the
  * standard shim any library shipping native Catalyst expressions uses
  * (Spark 4 wraps Columns in ColumnNodes; ExpressionUtils is the
  * sanctioned converter but is sql-private). Kept to two one-liners so
  * the dependency surface on Spark internals stays minimal. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
