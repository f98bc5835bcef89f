package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule fusing the higher-order-function cosine pattern
  * (`aggregate(zip_with(a,b,(x,y)->x*y),0d,+) / (sqrt(dot(a,a)) *
  * sqrt(dot(b,b)))` — what [[graft.functions.VectorOps.cosine]] builds)
  * into the native codegen [[VectorCosine]] expression.
  *
  * Interpreted lambda evaluation per element becomes a fused Java loop
  * inside whole-stage codegen — user code written with public DataFrame
  * primitives silently gets the fast path. Null semantics are identical:
  * both formulations yield null on null/empty/length-mismatched input and
  * on zero vectors (HOF divides by 0.0 → null under non-ANSI division).
  *
  * Matching is conservative: the multiply/add lambdas must be exactly the
  * two lambda variables (modulo casts), and the three dot-products must be
  * over semantically equal children — anything else is left untouched.
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other            => other
  }

  private def isFpArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Identity finish lambda: `acc -> acc`. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => stripCast(body).semanticEquals(v)
    case _                                                    => false
  }

  /** Matches aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
    * with an identity finish, over float/double arrays only — anything else
    * (int arrays, a smoothing finish lambda) must not fuse. */
  private def dotOf(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if zero == 0.0 && isFpArray(a) && isFpArray(b) && isIdentityFinish(finish) &&
          stripCast(ml).semanticEquals(x) && stripCast(mr).semanticEquals(y) &&
          stripCast(al).semanticEquals(acc) && stripCast(ar).semanticEquals(v) =>
      Some((a, b))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // EvalMode.TRY only (what try_divide builds, what VectorOps.cosine
    // emits): a plain ANSI `/` must keep its DIVIDE_BY_ZERO error
    // semantics, while VectorCosine yields null like try_divide.
    // (Guard, not pattern: the constructor param is a NumericEvalContext
    // in Spark 4.1, but the node exposes the resolved evalMode.)
    case d @ Divide(dot, Multiply(Sqrt(na), Sqrt(nb), _), _) if d.evalMode == EvalMode.TRY =>
      (dotOf(dot), dotOf(na), dotOf(nb)) match {
        case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
            if a.semanticEquals(a1) && a.semanticEquals(a2) &&
              b.semanticEquals(b1) && b.semanticEquals(b2) =>
          VectorCosine(a, b)
        case _ => d
      }
  }
}
