package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression <-> Column bridge for graft's native Catalyst expressions
  * ([[graft.expressions.VectorExpressions]] etc).
  *
  * Spark 4 backs `Column` by `ColumnNode` and keeps the converters
  * (`classic.ExpressionUtils`) `private[sql]`, so a library that defines
  * its own `Expression`s needs this one-file shim in the sql package —
  * the same technique Spark-native extension libraries use. Everything
  * referenced here is public Apache Spark source.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
