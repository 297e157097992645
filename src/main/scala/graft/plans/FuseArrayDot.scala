package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: fuse the composed dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * into the native codegen'd [[ArrayDotProduct]] node — same left-to-right
  * double accumulation, minus the intermediate zip array and per-element
  * lambda dispatch.
  *
  * Opt-in (installed by [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`), with two deliberate limits:
  *
  *   - dense-vector contract: on arrays containing null elements or of
  *     unequal length the composed form returns null while `array_dot`
  *     skips/truncates — the similarity paths that produce this idiom
  *     guarantee dense equal-length vectors (same contract as
  *     ArrayDotProduct's own scaladoc);
  *   - no fusion inside enclosing lambdas: if either array argument
  *     references an outer lambda variable (e.g. the per-plane dot inside
  *     `hyperplaneSig`'s fold), the rewrite is skipped — a custom
  *     expression inside a nested lambda that feeds a self-join key trips
  *     Spark 4.1's constraint inference (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND,
  *     see sim_neardup_rerank's scaladoc).
  */
object FuseArrayDot extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(
              Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(aacc, ael, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(finBody, Seq(fin: NamedLambdaVariable), _))
          if zero == 0.0 &&
            isVar(mx, x) && isVar(my, y) &&
            isVar(aacc, acc) && isVar(ael, el) &&
            isVar(finBody, fin) &&
            isDenseDoubleArray(a) && isDenseDoubleArray(b) &&
            noOuterLambdaRefs(a) && noOuterLambdaRefs(b) =>
        ArrayDotProduct(a, b)
    }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def isDenseDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def noOuterLambdaRefs(e: Expression): Boolean =
    !e.exists(_.isInstanceOf[NamedLambdaVariable])
}
