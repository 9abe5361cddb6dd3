package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 hides `Column.expr` behind
  * `private[sql]` (Spark Connect split); third-party expression libraries
  * conventionally expose it via a shim in the org.apache.spark.sql
  * namespace. Only these two forwarders live here.
  */
object shim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
