package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made `new Column(expr)` private;
  * the supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]` — this shim (in an org.apache.spark.sql subpackage, the
  * standard extension-library pattern) re-exports just the two converters
  * needed to expose custom Catalyst expressions as Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
