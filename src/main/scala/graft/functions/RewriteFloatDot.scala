package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftfn.FloatVectorDot
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (injected by [[GraftExtensions]]): rewrite the
  * composable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, (s, x) -> s + x) }}}
  *
  * over two `array<float>` columns into the codegen'd
  * [[org.apache.spark.sql.graftfn.FloatVectorDot]]. HOF lambdas evaluate
  * interpreted — per-element dispatch outside WholeStageCodegen, measured
  * 6× slower on the brute-force similarity queries — so users who write
  * the natural composable form get the fast path automatically.
  *
  * Scope is deliberately exact-semantics-only: the rule fires ONLY when
  * the product is computed in double (explicit casts), which is
  * bit-identical to FloatVectorDot's `(double)x * (double)y`
  * accumulation. The all-float form (`(x, y) -> x * y`) rounds each
  * product to float32 first and is NOT rewritten — an optimizer must
  * never change results.
  *
  * Ragged-array semantics (the one place the two forms diverge):
  * `zip_with` pads the shorter array with nulls, so the HOF form returns
  * NULL on unequal lengths, while FloatVectorDot dots the common prefix.
  * The rewrite therefore emits
  * `If(size(a) = size(b), graft_fdot(a, b), NULL)` — equal lengths take
  * the codegen'd fast path, unequal lengths (and NULL arrays, for which
  * `size` is NULL and `If` falls through) reproduce the HOF's NULL
  * exactly. Null ELEMENTS inside equal-length arrays remain undefined by
  * FloatVectorDot's dense-vector contract (see its scaladoc).
  */
object RewriteFloatDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(px, py, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(accRef: NamedLambdaVariable, elemRef: NamedLambdaVariable, _), Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
          LambdaFunction(finBody: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          isDoubleOf(px, x) && isDoubleOf(py, y) &&
          accRef.exprId == acc.exprId && elemRef.exprId == elem.exprId &&
          finBody.exprId == fin.exprId =>
      // No re-fire risk: the ArrayAggregate node is consumed, not kept as
      // the else branch.
      If(EqualTo(Size(a), Size(b)), FloatVectorDot(a, b),
        Literal(null, DoubleType))
  }
}
