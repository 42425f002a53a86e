package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters of
  * classic Spark 4.x (the `new Column(expr)` constructor was removed when
  * sql-api split off). Pattern per public Spark extensions (SNIPPETS.md [3]). */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
