package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native `size(array_intersect(a, b))` for long arrays with
  * whole-stage codegen: the count of DISTINCT elements of `a` that
  * also occur in `b` (null counts once when present in both — exactly
  * ArrayIntersect's multiset contract), without materializing the
  * intersection array or a boxed hash set.
  *
  * Why it exists: every Jaccard/containment verify in the dedup
  * family (q25/q26/q69/q72/q76/q108 and the q60/q68/q73/q86
  * consumers of the stored signature index) scores candidate pairs
  * with `size(array_intersect(a_sk, b_sk))` over ~hundreds-of-element
  * 60-bit shingle-key arrays. ArrayIntersect builds an OpenHashSet
  * AND an output array per pair just to take its length. This
  * expression copies both sides to primitive long[], sorts (bounded,
  * cache-resident), and merge-counts distinct matches — allocation is
  * two primitive arrays, zero boxing, zero result construction.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.IntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Distinct-common-value count via copy + sort + merge walk. Called
    * from generated code — must stay a static-friendly object method.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    var aNull = false
    var bNull = false
    val av = new Array[Long](na)
    var ai = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else { av(ai) = a.getLong(i); ai += 1 }
      i += 1
    }
    val bv = new Array[Long](nb)
    var bi = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else { bv(bi) = b.getLong(i); bi += 1 }
      i += 1
    }
    java.util.Arrays.sort(av, 0, ai)
    java.util.Arrays.sort(bv, 0, bi)
    var n = if (aNull && bNull) 1 else 0
    var x = 0
    var y = 0
    while (x < ai && y < bi) {
      val va = av(x)
      val vb = bv(y)
      if (va < vb) x += 1
      else if (va > vb) y += 1
      else {
        n += 1
        // advance past the whole equal run on BOTH sides: distinct count
        while (x < ai && av(x) == va) x += 1
        while (y < bi && bv(y) == va) y += 1
      }
    }
    n
  }
}
