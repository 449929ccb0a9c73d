package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native one-pass SimHash fingerprint: md5 each token and accumulate
  * all `width` bit votes in a single traversal of the token array.
  *
  * The declarative form (HashFunctions.simhashSinglePassSpark)
  * materializes a per-token digest STRING array, then runs an
  * interpreted aggregate whose merge builds a width-element vote
  * array per token via nested zip_with/transform lambdas — per-token
  * allocations of a hex string, a lambda frame and two long arrays.
  * Here each token is hashed once into 16 raw bytes and the votes
  * update an int array in place; no hex encoding, no intermediate
  * arrays, no lambda interpretation. Bit semantics are byte-for-byte
  * the declarative scheme's (and the DuckDB oracle's,
  * HashFunctions.simhashFromHashesSql): bit b draws hex digit b/4 of
  * the digest (even index = high nibble), takes bit b%4 of its value,
  * votes ±1, and the fingerprint sets bit b iff the vote total is
  * positive. SimHashSigSpec pins value equality at widths 16 and 24.
  *
  * Feeds q27's exact-collision grouping and q69's probe table — the
  * per-row-dominant stage of the simhash family.
  */
case class SimHashSig(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1 && width <= 62, s"simhash width must be in [1, 62], got $width")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashSig.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {

  /** Called from generated code. A NULL token element mirrors the
    * declarative twin exactly: md5(NULL) nulls every running vote, and
    * the final `CASE WHEN NULL > 0` contributes 0 for every bit — so
    * the whole fingerprint collapses to 0 (not NULL).
    */
  // one digest per executor thread, reset per row: getInstance does a
  // provider lookup + allocation, too heavy for the per-row hot path
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData, width: Int): Long = {
    val votes = new Array[Int](width)
    val md = mdLocal.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return 0L
      md.reset()
      val digest = md.digest(toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < width) {
        val hexPos = b >> 2 // hex digit index = b/4; even = high nibble
        val byte = digest(hexPos >> 1) & 0xff
        val v = if ((hexPos & 1) == 0) byte >>> 4 else byte & 0xf
        votes(b) += ((((v >> (b & 3)) & 1) << 1) - 1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < width) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
