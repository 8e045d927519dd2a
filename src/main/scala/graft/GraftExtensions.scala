package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expr.FloatDotProduct

/** Catalyst extension point: registers the engine's native expressions
  * as SQL functions, so `spark.sql("... float_dot(a, b) ...")` works
  * anywhere the library is on the classpath — installed either via
  * `.withExtensions(new GraftExtensions)` (Sessions does this) or
  * `spark.sql.extensions=graft.GraftExtensions` on any existing
  * cluster, the standard deployment path for Spark extension libraries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(
        classOf[FloatDotProduct].getName, null, "float_dot",
        "float_dot(a, b) - dot product of two float arrays in double precision",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "float_dot takes exactly 2 arguments")
        FloatDotProduct(children.head, children(1))
      }))
  }
}
