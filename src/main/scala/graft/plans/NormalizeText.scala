package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native canonical text normalization (the fused form of q34's
  * declarative chain):
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
  *
  * Lowercasing delegates to UTF8String.toLowerCase — the EXACT
  * operation Spark's lower() performs, so locale/special-mapping
  * behavior cannot diverge — and the two regex passes + trim collapse
  * into one scan of the lowered bytes (keep [a-z0-9 ], squeeze space
  * runs, drop leading/trailing spaces). Equality with the declarative
  * chain is therefore structural, and NormalizeTextSpec pins it on
  * the corpus and on edge fixtures; the DuckDB oracle keeps the
  * declarative SQL.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Called from generated code — static-friendly object method. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toLowerCase.toString // exact lower() semantics
    val out = new java.lang.StringBuilder(str.length)
    var pendingSpace = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i) // kept chars are all BMP/ASCII: char scan is safe
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else if (c == ' ') {
        // a space run (after dropping other chars) collapses to one,
        // and only BETWEEN kept characters (trim eats the ends)
        pendingSpace = true
      }
      // every other char: dropped by the [^a-z0-9 ] class
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}
