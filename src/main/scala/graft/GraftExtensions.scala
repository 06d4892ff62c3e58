package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{DotProduct, L2Norm}

/** SparkSessionExtensions hook: makes the engine's native expressions
  * available in any session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the standard deployment
  * path for a Spark-native library (no code change in user jobs, SQL-level
  * access to graft_dot / graft_l2norm). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_l2norm"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[L2Norm].getName, "graft_l2norm"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          L2Norm(exprs.head)))
  }
}
