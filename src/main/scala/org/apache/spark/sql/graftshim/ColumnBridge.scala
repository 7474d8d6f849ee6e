package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor; the
  * supported bridge (`classic.ExpressionUtils`) is `private[sql]`, so
  * this one-file shim lives under `org.apache.spark.sql` — the standard
  * technique for a library that defines its own Catalyst expressions
  * and wants to hand them to the public Column API directly, without a
  * function-registry round-trip (which would tie Column construction to
  * whichever SparkSession happens to be active on the calling thread).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
