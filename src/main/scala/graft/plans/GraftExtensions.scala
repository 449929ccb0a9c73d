package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the declarative whitespace-token-count
  * pattern
  * `size(filter(split(trim(c), "\\s+"), t -> t != ""))`
  * into the native codegen'd [[TokenCount]] byte scan.
  *
  * This is the Spark-first shape for a custom fast path: user code
  * stays declarative (and engine-portable); the session extension
  * swaps in the faster physical expression wherever the pattern
  * appears — including inside SQL text and nested lambdas.
  */
object TokenCountRule extends Rule[LogicalPlan] {

  private val wsPattern = UTF8String.fromString("\\s+")
  private val empty = UTF8String.fromString("")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(
            ArrayFilter(
              StringSplit(StringTrim(c, None), Literal(pat: UTF8String, _), Literal(-1, _)),
              LambdaFunction(Not(EqualTo(v: NamedLambdaVariable, Literal(e: UTF8String, _))), Seq(v2: NamedLambdaVariable), _)),
            _) if pat == wsPattern && e == empty && v.exprId == v2.exprId =>
        TokenCount(c)
    }
}

/** Session extension wiring: the optimizer rule plus a `token_count`
  * SQL function. Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TokenCountRule)
    ext.injectFunction((
      new FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (children: Seq[Expression]) =>
        TokenCount(Cast(children.head, org.apache.spark.sql.types.StringType))))
  }
}
