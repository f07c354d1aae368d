package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the classic Column ⇄ Expression converters, which
  * are `private[sql]` in Spark 4. Lets graft build its native
  * expressions (e.g. [[graft.expr.Hash56]]) as Columns directly —
  * no SparkSession.active lookup, no function-registry round-trip, no
  * analyzer UnresolvedFunction hop per Column construction — while the
  * registry path stays for SQL-surface use. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
