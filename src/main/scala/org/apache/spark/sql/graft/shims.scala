package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public Column
  * API. Spark 4 made Column a ColumnNode wrapper and the Expression↔Column
  * converters `private[sql]`, so this one-file shim lives in the sql package
  * namespace — the standard pattern for libraries shipping custom
  * expressions (Delta, Sedona, Qbeast all do the same).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
