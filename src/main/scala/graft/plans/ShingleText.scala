package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass w=3 shingler: text straight to the 3-token shingle
  * array, fusing the declarative
  * `tokens(text)` (trim + regex split + non-empty filter) and
  * `HashFunctions.shingles(toks)` (transform + concat_ws) chain.
  *
  * The declarative chain is two lambda HOFs (filter, transform), and a
  * single lambda anywhere in a projection forces the WHOLE projection
  * interpreted — so the signature stage (shingles3 + minhash_sig)
  * could never reach whole-stage codegen while the shingler was a
  * lambda. Beyond WSCG, the fused form allocates nothing per token:
  * tokens are (start,end) byte ranges into the input, and each shingle
  * is assembled by three range copies around single-space separators —
  * no token UTF8Strings, no token array, no regex.
  *
  * Value-identical to the declarative form for non-null input
  * (ShingleTextSpec pins it; the DuckDB oracles speak the declarative
  * dialect): tokens are maximal runs of non-whitespace bytes, where
  * whitespace = Java regex \\s = [ \t\n\x0B\f\r] (all single-byte
  * ASCII, so the byte scan is exact for multi-byte UTF-8 content);
  * fewer than 3 tokens yields an empty array. NULL input propagates
  * to NULL (the declarative when/otherwise yields an empty array
  * there — every call site filters degenerate docs either way, and
  * null-propagation is what the other graft expressions do).
  */
case class ShingleText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any =
    ShingleText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleText =
    copy(child = newChild)
}

object ShingleText {

  private val w = 3 // shingle width, pinned by every oracle twin

  private def isWs(b: Byte): Boolean = b == ' ' || (b >= 9 && b <= 13)

  /** Called from generated code — must stay a static-friendly object
    * method.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // pass 1: count tokens, so the offset arrays are allocation-exact
    var n = 0
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    if (n < w) return new GenericArrayData(Array.empty[AnyRef])
    // pass 2: record each token's [start, end) byte range
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var t = 0
    i = 0
    inTok = false
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) { starts(t) = i; inTok = true }
      else if (ws && inTok) { ends(t) = i; t += 1; inTok = false }
      i += 1
    }
    if (inTok) { ends(t) = bytes.length; t += 1 }
    // assemble shingles: three range copies + two separator bytes each
    val out = new Array[AnyRef](n - w + 1)
    var sh = 0
    while (sh <= n - w) {
      var len = w - 1
      var k = 0
      while (k < w) { len += ends(sh + k) - starts(sh + k); k += 1 }
      val buf = new Array[Byte](len)
      var p = 0
      k = 0
      while (k < w) {
        if (k > 0) { buf(p) = ' '; p += 1 }
        val tl = ends(sh + k) - starts(sh + k)
        System.arraycopy(bytes, starts(sh + k), buf, p, tl)
        p += tl
        k += 1
      }
      out(sh) = UTF8String.fromBytes(buf)
      sh += 1
    }
    new GenericArrayData(out)
  }
}
