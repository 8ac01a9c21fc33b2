package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the builtin-HOF dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * (with or without per-element double casts) into the codegen'd
  * [[DotProductF]]. Users writing portable HOF code get the native
  * tight loop without changing a line — the classic use of an injected
  * `Rule[LogicalPlan]` (SparkSessionExtensions), reserved for exactly
  * this case: semantics Spark's own optimizer can't see.
  *
  * Semantics-preserving by construction: DotProductF was specified to
  * match the HOF bit-for-bit, INCLUDING the null cases (length
  * mismatch → NULL via zip_with padding, any null element → NULL via
  * null-poisoned sum, left-to-right double accumulation — see
  * VectorExpressions.scala:45-48). The pattern only fires when both
  * sides are float/double arrays, the multiply consumes exactly the
  * two zip variables, the zero is literal 0.0, the merge is a plain
  * add of the two accumulator variables, and the finish lambda is the
  * identity.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVectorArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda-variable id behind `x` or `CAST(x AS DOUBLE)`. */
  private def varId(e: Expression): Option[Long] = e match {
    case v: NamedLambdaVariable => Some(v.exprId.id)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId.id)
    case _ => None
  }

  private def usesExactly(a: Expression, b: Expression,
                          vars: Seq[NamedLambdaVariable]): Boolean =
    Seq(varId(a), varId(b)).flatten.toSet ==
      vars.map(_.exprId.id).toSet && varId(a).isDefined && varId(b).isDefined

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), zipVars, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa, av, _), accVars, _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(fv: NamedLambdaVariable), _))
        if isVectorArray(l) && isVectorArray(r) &&
          zipVars.length == 2 && accVars.length == 2 &&
          zipVars.forall(_.isInstanceOf[NamedLambdaVariable]) &&
          accVars.forall(_.isInstanceOf[NamedLambdaVariable]) &&
          usesExactly(mx, my,
            zipVars.map(_.asInstanceOf[NamedLambdaVariable])) &&
          usesExactly(aa, av,
            accVars.map(_.asInstanceOf[NamedLambdaVariable])) &&
          fin.exprId == fv.exprId =>
        DotProductF(l, r)
    }
}
