package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.LongArrayDot

/** Optimizer rule: rewrite the interpreted SQL dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)
  *
  * over `array<bigint>` into the compiled [[LongArrayDot]] expression.
  * Catalyst's higher-order functions are CodegenFallback — the lambda
  * evaluates INTERPRETED per element and `zip_with` allocates a zipped
  * array per row — so in a similarity join this one idiom dominates
  * the stage; the native expression is a primitive loop inside
  * WholeStageCodegen (measured ~20× on the ann_sparse_bow shape; the
  * same reason [[graft.functions.VectorFunctions.dotQ]] exists for
  * Column-API users). This rule gives the speedup to `spark.sql`
  * users who write the textbook formulation, without them knowing the
  * native function exists.
  *
  * Semantics: when either array's schema admits null elements (file
  * sources always do), the rewrite uses [[LongArrayDot]]'s null-aware
  * mode, which reproduces the HOF form's NULL-on-null-element and
  * NULL-on-length-mismatch behavior bit-for-bit in the same compiled
  * loop. The one residual divergence — and why this ships in
  * [[graft.GraftExtensions]] as an explicit opt-in — is overflow: the
  * native sum wraps, the interpreted form under ANSI throws.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  /** Can a null element (or length mismatch, which zip_with pads into
    * nulls) reach the sum? File sources force containsNull=true, so
    * this is the common case — handled by [[LongArrayDot]]'s
    * null-aware compiled mode rather than by skipping the rewrite. */
  private def mayHoldNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, cn) => cn
    case _                       => true
  }

  /** (x, y) -> x * y over exactly the lambda's own two variables. */
  private def isElementwiseMul(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(m: Multiply, args, _) if args.length == 2 =>
      val ids = args.map(_.exprId).toSet
      (m.left, m.right) match {
        case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
          a.exprId != b.exprId && ids == Set(a.exprId, b.exprId)
        case _ => false
      }
    case _ => false
  }

  /** (s, v) -> s + v (either operand order). */
  private def isPlainSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(a: Add, args, _) if args.length == 2 =>
      val ids = args.map(_.exprId).toSet
      (a.left, a.right) match {
        case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
          x.exprId != y.exprId && ids == Set(x.exprId, y.exprId)
        case _ => false
      }
    case _ => false
  }

  /** s -> s (aggregate's default finish). */
  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            zw @ ZipWith(la, ra, mul: LambdaFunction),
            Literal(0L, LongType), merge: LambdaFunction,
            finish: LambdaFunction)
          if isLongArray(la) && isLongArray(ra) &&
            isElementwiseMul(mul) && isPlainSum(merge) &&
            isIdentity(finish) =>
        LongArrayDot(la, ra,
          nullAware = mayHoldNulls(la) || mayHoldNulls(ra))
    }
}
