package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. Spark 4 wraps columns in ColumnNodes whose expression
  * converters are `private[sql]`, so this one file lives under
  * org.apache.spark.sql — standard practice for Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression = c.node match {
    case ExpressionColumnNode(e, _) => e
    case other                      => ColumnNodeToExpressionConverter.apply(other)
  }
}
