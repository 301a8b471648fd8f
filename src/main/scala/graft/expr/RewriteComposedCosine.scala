package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the composable cosine formulation —
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)`
  * divided by the product of the two self-dot norms — into the fused
  * [[CosineSimilarity]] kernel.
  *
  * Why a rule and not just the function: users composing cosine from
  * built-ins (the natural first formulation, and what SQL written against
  * another engine migrates as) would otherwise walk each vector three
  * times and allocate a products array per pair; the kernel does one
  * zero-allocation pass. The rewrite is sound because the kernel is
  * bit-identical to the composed tree on every input IN EITHER ANSI MODE
  * — same left-to-right accumulation, NULL on mismatched lengths
  * (`zip_with` padding), and the session's `Divide` behavior on zero-norm
  * vectors (ANSI: DIVIDE_BY_ZERO error; legacy: NULL) — all pinned by
  * `OperatorsSpec`.
  *
  * Matching is deliberately strict (exact dot shape, same child on both
  * sides of each self-dot, `array<float>` inputs): anything else is left
  * untouched.
  */
object RewriteComposedCosine extends Rule[LogicalPlan] {

  /** `aggregate(zip_with(l, r, (x, y) -> double(x) * double(y)), 0.0,
    * (acc, v) -> acc + v)` with the identity finish lambda. */
  private object DotShape {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType),
          merge: LambdaFunction, finish: LambdaFunction)
          if zero == 0.0 && isCastProduct(zw.function) &&
            isVarSum(merge) && isIdentity(finish) =>
        Some((zw.left, zw.right))
      case _ => None
    }
  }

  private def isCastProduct(fn: Expression): Boolean = fn match {
    case LambdaFunction(Multiply(
        Cast(x: NamedLambdaVariable, DoubleType, _, _),
        Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    // the double-array form: SimplifyCasts has removed the no-op
    // double→double casts by the time injected optimizer rules run, so
    // the lambda is a bare product of the variables
    case LambdaFunction(
        Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.dataType == DoubleType && y.dataType == DoubleType &&
        x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isVarSum(fn: Expression): Boolean = fn match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isIdentity(fn: Expression): Boolean = fn match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      x.exprId == a.exprId
    case _ => false
  }

  private def isVectorArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotShape(a, b),
        Multiply(Sqrt(DotShape(a2, a3)), Sqrt(DotShape(b2, b3)), _), ctx)
        if a.semanticEquals(a2) && a2.semanticEquals(a3) &&
          b.semanticEquals(b2) && b2.semanticEquals(b3) &&
          isVectorArray(a) && isVectorArray(b) &&
          a.dataType == b.dataType =>
      // the kernel's zero-norm behavior follows the REPLACED Divide's own
      // mode (captured at its analysis), not the conf at rewrite time:
      // ANSI throws; LEGACY and TRY both yield NULL, which the NULL
      // kernel matches
      CosineSimilarity(a, b, ansiEnabled = ctx.evalMode == EvalMode.ANSI)
  }
}
