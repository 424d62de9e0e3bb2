package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 made the classic `Column(expr)`
 * constructor path `private[sql]` (`ExpressionUtils` in
 * columnNodeSupport.scala), so expressions that carry non-Column state
 * — graft's [[graft.functions.EnsembleScore]] embeds the trained model
 * object — need an accessor inside the `org.apache.spark.sql` package
 * to be wrapped into user-facing Columns. Function-registry
 * registration (the `call_function` route GraftFunctions uses for
 * cosine) cannot express these, because registry builders only receive
 * child Expressions.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
