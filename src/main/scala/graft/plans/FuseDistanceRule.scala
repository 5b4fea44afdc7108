package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the interpreted higher-order-function forms
  * of squared-L2 and inner product — the shapes a SQL user naturally
  * writes, and the canonical `Distances.l2Sq`/`dot` trees —
  *
  *   aggregate(zip_with(A, B, (x, y) -> (x − y) · (x − y)), 0.0, +)
  *   aggregate(zip_with(A, B, (x, y) -> x · y),             0.0, +)
  *
  * (with optional per-element double casts, either as a
  * `transform(_, cast)` wrapper or inline on the lambda operands) —
  * into the fused whole-stage-codegen [[L2SqDistance]]/[[DotProduct]]
  * expressions, which evaluate one primitive loop per row instead of
  * materializing a zipped array and dispatching two lambdas per
  * element. Numerics are identical (per-element double cast,
  * left-to-right accumulation — parity-tested in L2SqDistanceSpec), so
  * the rewrite cannot change an oracle-checked result.
  *
  * Ragged pairs are value-preserved too: the HOF forms yield NULL on
  * mismatched lengths (zip_with pads with nulls) and the fused
  * expressions return NULL on a length mismatch as well; NULL *elements*
  * likewise map to a NULL result in both forms (the fused loops carry a
  * per-element null branch, emitted only for `containsNull` schemas), so
  * the rewrite never changes value or nullability on arbitrary user SQL.
  * The fused [[CosineSim]] inherits the matched Divide's own evalMode for
  * its zero-divisor behavior (throw under ANSI, NULL under LEGACY/TRY) —
  * a `try_divide`-shaped tree keeps its return-NULL contract.
  *
  * Injected by `spark.sql.extensions=graft.GraftExtensions`
  * (injectOptimizerRule) — a user writing plain HOF SQL gets the fused
  * plan automatically; `.explain` shows `l2sqdistance(...)` instead of
  * the aggregate/zip_with chain.
  */
object FuseDistanceRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  /** `transform(arr, x -> cast(x as double))` → `arr`; else unchanged. */
  private def stripCastTransform(e: Expression): Expression = e match {
    case ArrayTransform(arg,
        LambdaFunction(Cast(x, DoubleType, _, _), Seq(a: NamedLambdaVariable), _))
        if sameVar(x, a) => arg
    case other => other
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Lambda operand is the variable itself or `cast(var as double)`. */
  private def operandOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(x, DoubleType, _, _) => sameVar(x, v)
    case x => sameVar(x, v)
  }

  private def isPlus(fn: Expression): Boolean = fn match {
    case LambdaFunction(Add(a, b, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      sameVar(a, acc) && sameVar(b, v)
    case _ => false
  }

  private def isIdentity(fn: Expression): Boolean = fn match {
    case LambdaFunction(x, Seq(a: NamedLambdaVariable), _) => sameVar(x, a)
    case _ => false
  }

  private object Fusable {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(
          ZipWith(l0, r0,
            LambdaFunction(body,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(z: Double, DoubleType), mergeFn, finishFn)
          if z == 0.0 && isPlus(mergeFn) && isIdentity(finishFn) =>
        val l = stripCastTransform(l0)
        val r = stripCastTransform(r0)
        if (!isFloatArray(l) || !isFloatArray(r)) None
        else body match {
          case Multiply(Subtract(a1, b1, _), Subtract(a2, b2, _), _)
              if operandOf(a1, x) && operandOf(b1, y) &&
                operandOf(a2, x) && operandOf(b2, y) =>
            Some(L2SqDistance(l, r))
          case Multiply(a1, b1, _)
              if operandOf(a1, x) && operandOf(b1, y) =>
            Some(DotProduct(l, r))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val dotsFused = plan.transformAllExpressions { case Fusable(fused) => fused }
    // second pass: the cosine ratio over now-fused dots —
    //   dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))  →  CosineSim(a,b)
    // (the canonical Distances.cosineSim tree and the natural SQL form;
    // one fused loop instead of three). Numerics identical: each sum
    // keeps its left-to-right accumulation and the combine expression
    // is unchanged.
    dotsFused.transformAllExpressions {
      case Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), evalMode)
          if a.semanticEquals(a1) && a.semanticEquals(a2) &&
            b.semanticEquals(b1) && b.semanticEquals(b2) =>
        // zero-divisor semantics follow the MATCHED Divide, not the session:
        // ANSI throws; LEGACY and TRY (try_divide) both return NULL
        CosineSim(a, b, failOnError = evalMode == EvalMode.ANSI)
    }
  }
}
