package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two double arrays with whole-stage codegen.
  *
  * Semantically identical to the declarative fold
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * bit for bit: the accumulation is the same strict left-to-right
  * double sum (0.0 + x == x in IEEE754, including the -0.0 first
  * element, where both forms produce 0.0 - compensated summation or
  * pairwise reordering would NOT be identical and is deliberately not
  * used). Null semantics follow the fold too: a null array, a length
  * mismatch (zip_with pads the short side with null), or any null
  * element poisons the product chain, so the result is null.
  *
  * Why it exists: Catalyst higher-order functions (ZipWith,
  * ArrayAggregate) are CodegenFallback - every evaluation walks an
  * interpreted lambda tree and materializes the zipped array. The
  * pair-scoring loops of the vector family (q28/q29/q30/q42/q70/q79/
  * q87/q96/q106) evaluate millions of dot products per task; this
  * expression is one primitive-double loop over the two ArrayData
  * buffers, no allocation, inside whole-stage codegen.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null element
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotRes")
      s"""
         |java.lang.Double $r = graft.plans.VecDot.dot($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Strict left-to-right fold; null mirrors the declarative form's
    * null poisoning. Called from generated code - must stay a
    * static-friendly object method.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
