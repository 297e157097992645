package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension installer: registers the custom Catalyst expressions
  * for SQL use and the engine's optimizer rules. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or programmatically
  * via `withExtensions`); after that `SELECT array_dot(a, b)` plans the
  * native codegen'd node, and composed dot-product idioms are fused into
  * it by [[FuseArrayDot]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "array_dot expects exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => FuseArrayDot)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
