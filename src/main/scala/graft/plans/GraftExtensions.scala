package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.F

/** Engine extension installer: registers the custom Catalyst expressions
  * for SQL use and the engine's optimizer rules. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or programmatically
  * via `withExtensions`); after that `SELECT array_dot(a, b)` plans the
  * native codegen'd node, and composed dot-product idioms are fused into
  * it by [[FuseArrayDot]].
  *
  * The scalar F-surface is also exposed to pure SQL (`graft_haversine`,
  * `graft_fractional_odds`, `graft_strip_suffix`, `graft_parse_dayfirst`)
  * — the builders expand to the SAME composed Catalyst expressions the
  * Column API produces, so SQL users get identical semantics and codegen,
  * not a parallel implementation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "array_dot expects exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    GraftExtensions.sqlFunctions.foreach { case (name, arity, f) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(F.getClass.getName, name),
        GraftExtensions.expressionBuilder(name, arity, f)))
    }
    ext.injectOptimizerRule(_ => FuseArrayDot)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  /** The SQL-exposed scalar surface: (name, arity, Column builder). One
    * table, consumed by both [[GraftExtensions.apply]] and the spec, so
    * what CI exercises IS what the extension installs.
    */
  val sqlFunctions: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("graft_haversine", 4, cs => F.haversineKm(cs(0), cs(1), cs(2), cs(3))),
    ("graft_fractional_odds", 1, cs => F.fractionalToDecimal(cs(0))),
    ("graft_strip_suffix", 1, cs => F.stripParenSuffix(cs(0))),
    ("graft_parse_dayfirst", 1, cs => F.parseDateDayFirst(cs(0))))

  def expressionBuilder(name: String, arity: Int,
                        f: Seq[Column] => Column): Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.length == arity, s"$name expects exactly $arity arguments")
      GraftSqlBridge.eagerExpression(f(children.map(GraftSqlBridge.column)))
    }
}
