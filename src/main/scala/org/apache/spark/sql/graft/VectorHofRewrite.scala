package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rewrite: the naive higher-order-function dot product
  *
  *   `aggregate(zip_with(transform(a, x -> double(x)),
  *                       transform(b, y -> double(y)),
  *                       (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)`
  *
  * — the obvious way a user writes vector math with builtins, and exactly
  * what [[graft.functions.VectorFunctions.dotHof]] builds — becomes the
  * fused codegen'd [[DotProductExpr]] (one loop, no per-pair array
  * allocation; measured 53× on the O(N²) scan that motivated the custom
  * expressions, see BASELINE.md). Users keep writing the declarative form;
  * Catalyst swaps in the fast kernel — the "let the optimizer do it" story
  * applied to our own extension.
  *
  * Deliberately conservative: it matches ONLY the exact shape above over
  * non-null `array<float>` bases (the expressions' input contract), with
  * the multiply/add lambda variables in either order and an identity
  * finish lambda. Anything else is left untouched. Semantics are identical
  * by the same argument as the fused-vs-HOF bit-equality specs: both
  * accumulate `double(a_i) * double(b_i)` left-to-right, both return null
  * for null/length-mismatched inputs.
  *
  * Installed via `graft.plans.GraftExtensions` (injectOptimizerRule).
  */
object VectorHofRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** Unwrap `transform(base, x -> cast(x as double))` over a float array
    * back to `base`. containsNull=true schemas (parquet reads mark
    * elements optional) are accepted — the fused expressions already run
    * directly on those columns throughout the library under its vectors-
    * are-null-free contract, and this rule only ever fires where the HOF
    * form ran under the same data.
    */
  private def stripToDouble(e: Expression): Option[Expression] = e match {
    case ArrayTransform(base, LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _))
        if c.dataType == DoubleType && isVar(c.child, v) =>
      base.dataType match {
        case ArrayType(FloatType, _) => Some(base)
        case _ => None
      }
    case _ => None
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(la, ra,
              LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(ad: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if ((isVar(m.left, x) && isVar(m.right, y)) ||
              (isVar(m.left, y) && isVar(m.right, x))) &&
            ((isVar(ad.left, acc) && isVar(ad.right, el)) ||
              (isVar(ad.left, el) && isVar(ad.right, acc))) &&
            isVar(fin, fv) =>
        for (l <- stripToDouble(la); r <- stripToDouble(ra)) yield (l, r)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case HofDot(l, r) => DotProductExpr(l, r)
  }
}

/** LogicalPlan → DataFrame bridge for rule tests (`Dataset.ofRows` is
  * private[sql], hence this package — same rationale as
  * [[VectorColumns]]'s Column bridge).
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
