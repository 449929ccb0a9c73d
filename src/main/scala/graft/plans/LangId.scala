package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass language ID over a token array (the fused form of
  * TextFunctions.langIdDeclarative): the declarative composite runs
  * one `filter(toks, isin(...))` array traversal PER language profile
  * plus an argmax expression tree; this scans the array once,
  * scoring all profiles per token, then applies the identical argmax
  * rule (score > 0; strictly beats every earlier language, ties-or-
  * beats every later one; all-zero → "und"). LangIdSpec pins value
  * equality with the declarative form, which the DuckDB oracles keep
  * speaking.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangId.id(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LangId.id($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** Rendered from the ONE stopword table
    * (TextFunctions.stopwords) — the profiles cannot drift from the
    * declarative/SQL forms.
    */
  private val langs: Array[UTF8String] =
    graft.functions.TextFunctions.stopwords.map(p => UTF8String.fromString(p._1)).toArray

  private val profiles: Array[java.util.HashSet[String]] =
    graft.functions.TextFunctions.stopwords.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  private val und = UTF8String.fromString("und")

  /** Called from generated code — static-friendly object method. */
  def id(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val scores = new Array[Int](profiles.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        var j = 0
        while (j < profiles.length) {
          if (profiles(j).contains(t)) scores(j) += 1
          j += 1
        }
      }
      i += 1
    }
    // earliest maximum wins (the declarative "beats all earlier
    // strictly, ties-or-beats all later" rule); all-zero -> und
    var best = -1
    var j = 0
    while (j < scores.length) {
      if (scores(j) > 0 && (best < 0 || scores(j) > scores(best))) best = j
      j += 1
    }
    if (best < 0) und else langs(best)
  }
}
