package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace-token counter with whole-stage codegen.
  *
  * Semantically identical to
  * `size(filter(split(trim(c), "\\s+"), t -> t != ""))` but runs as a
  * single byte scan: no regex, no array materialization, no lambda
  * interpretation. The declarative form allocates one UTF8String per
  * token plus the array — at 100 TB of text that's the difference
  * between scan-bound and GC-bound.
  *
  * Whitespace = Java regex \\s = [ \t\n\x0B\f\r]: all single-byte
  * ASCII, so a byte scan is exact even for multi-byte UTF-8 content.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  // input must be string-typed; the rule and the function builder both
  // guarantee it (the builder inserts an explicit Cast)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  /** Count maximal runs of non-whitespace bytes. Called from generated
    * code — must stay a static-friendly object method.
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 0
    var inToken = false
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || (b >= 9 && b <= 13) // \t \n \x0B \f \r
      if (!ws && !inToken) { n += 1; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    n
  }
}
