package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, EqualTo, Expression, LambdaFunction, Literal, NamedLambdaVariable, Not, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (builder-brief path (c), `injectOptimizerRule`): rewrite
  * the declarative whitespace-token count
  *
  *   size(filter(split(text, " "), x -> x <> ""))
  *
  * into the native [[TokenCount]] expression. The declarative form
  * materializes the token array per row and evaluates its lambda
  * interpreted (higher-order-function lambdas never reach codegen); the
  * rewrite turns it into a single codegen'd byte scan — users keep writing
  * the portable declarative form and the plan gets the fused kernel.
  *
  * Guards: the split separator must be the literal single space with the
  * default -1 limit, the predicate must be exactly `x <> ''` over the
  * lambda's own variable, and `size` must have ANSI null semantics
  * (legacySizeOfNull=false maps size(null) to null, like TokenCount; the
  * legacy -1 convention would change results so it is left untouched). */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  private def isNotEmptyPredicate(cond: Expression, v: NamedLambdaVariable): Boolean =
    cond match {
      case Not(EqualTo(lv: NamedLambdaVariable, Literal(e, StringType))) =>
        lv.exprId == v.exprId && e == Empty
      case Not(EqualTo(Literal(e, StringType), lv: NamedLambdaVariable)) =>
        lv.exprId == v.exprId && e == Empty
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(
          ArrayFilter(
            StringSplit(str, Literal(sep, StringType), Literal(-1, _)),
            LambdaFunction(cond, Seq(v: NamedLambdaVariable), _)),
          false) if sep == Space && isNotEmptyPredicate(cond, v) =>
      TokenCount(str)
  }
}
