package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash fingerprint with whole-stage
  * codegen (reference: the Rabin-Karp document fingerprint of
  * TextFunctions.fingerprint).
  *
  * Semantically identical to
  * `aggregate(split(c, ""), 0L, (h, ch) -> pmod(h*31 + ascii(ch), 2^31-1))`
  * but runs as one code-point scan: the declarative form materializes
  * a one-character UTF8String per input character before folding —
  * per-document allocation proportional to text length, which at
  * corpus scale turns a scan-bound fingerprint pass into a GC-bound
  * one.
  *
  * Iterates Unicode CODE POINTS (matching split("")'s per-character
  * elements and ascii()'s code-point value), not UTF-16 units or
  * bytes, so multi-byte content hashes identically to the declarative
  * form.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private final val Mod = 2147483647L

  /** Horner fold over code points mod 2^31-1. Called from generated
    * code — must stay a static-friendly object method.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
