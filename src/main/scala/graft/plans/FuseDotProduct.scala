package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the fused native [[DotProduct]] expression — one codegen'd loop
  * instead of an intermediate array plus per-element lambda dispatch.
  * [[DotProduct]] reproduces the chain's semantics exactly (element-order
  * double accumulation; null on length mismatch or null element), so the
  * substitution is observationally pure. The match is deliberately
  * conservative: any deviation from the canonical shape (extra finish
  * lambda work, different zero, non-float/double arrays) leaves the plan
  * untouched.
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripDoubleCast(c.child)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case r: NamedLambdaVariable => r.exprId == v.exprId
      case _ => false
    }

  private def isNumArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(facc: NamedLambdaVariable), _))
          if isNumArray(a) && isNumArray(b) &&
            // the multiply itself must be double-precision: for float
            // arrays a FloatType multiply (uncast lambda vars) rounds each
            // product to float before accumulating — DotProduct multiplies
            // in double, so fusing would change result bits
            mul.dataType == DoubleType &&
            ((isVar(mul.left, x) && isVar(mul.right, y)) ||
              (isVar(mul.left, y) && isVar(mul.right, x))) &&
            ((isVar(add.left, acc) && isVar(add.right, v)) ||
              (isVar(add.left, v) && isVar(add.right, acc))) &&
            fin.exprId == facc.exprId =>
        DotProduct(a, b)
    }
}
