package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils` private[sql]; a library defining native
  * `Expression`s (graft.exprs) needs exactly its two conversions. This tiny
  * shim lives in the classic package to re-export them — public Spark API
  * surface, no behavior of its own.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
