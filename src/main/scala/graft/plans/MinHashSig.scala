package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature: all 12 components of the
  * salted-md5 slice scheme (HashFunctions.saltedHashes +
  * minhashFromHashes — reference semantics: MinHash over w=3
  * shingles) computed in a single traversal of the shingle array.
  *
  * The declarative form materializes two salted digest arrays and then
  * runs twelve interpreted transform+array_min traversals with a
  * substring allocation per (element, component). Here each shingle is
  * hashed twice (the same two md5 calls — cross-engine byte-identical
  * values) and its twelve 5-hex-digit slices update running minima in
  * place: no intermediate digest arrays and no per-slice allocations.
  * That fused single pass is the win — it holds in interpreted
  * projections too, which matters because sigTable's tokenizer/shingle
  * lambdas force its projection interpreted regardless (HOFs never
  * codegen); over a plain stored array column the expression also
  * stays inside whole-stage codegen. Signatures feed
  * q24/q25/q47/q60/q68/q73 — the hottest per-row stage of every text
  * query — which is what justifies a native expression over the
  * composed built-ins.
  *
  * The value layout is pinned by the DuckDB oracle twin
  * (HashFunctions.minhashFromHashesSql): component i = min over
  * shingles of substring(md5((i/6) + "|" + s), 1 + (i%6)*5, 5).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  val components = 12
  private val salts = 2      // md5 digests per shingle
  private val slices = 6     // 5-hex-digit slices per digest
  private val sliceLen = 5

  private val hexDigits = "0123456789abcdef".getBytes

  /** Called from generated code — must stay a static-friendly object
    * method. NULL input elements follow the declarative semantics
    * (md5(concat(salt, NULL)) is NULL, and array_min skips NULLs).
    */
  // one digest per executor thread, reset per use: getInstance does a
  // provider lookup + allocation, too heavy for the per-row hot path
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(sh: ArrayData): ArrayData = {
    val mins = new Array[Array[Byte]](components)
    val md = mdLocal.get()
    var i = 0
    while (i < sh.numElements()) {
      if (!sh.isNullAt(i)) {
        val bytes = sh.getUTF8String(i).getBytes
        var salt = 0
        while (salt < salts) {
          md.reset()
          md.update(if (salt == 0) '0'.toByte else '1'.toByte)
          md.update('|'.toByte)
          md.update(bytes)
          val digest = md.digest() // 16 bytes = 32 hex chars
          var slice = 0
          while (slice < slices) {
            // hex-encode the slice's 5 chars (2.5 bytes) directly
            val cand = new Array[Byte](sliceLen)
            var p = 0
            while (p < sliceLen) {
              val hexPos = slice * sliceLen + p
              val b = digest(hexPos / 2) & 0xff
              cand(p) = hexDigits(if (hexPos % 2 == 0) b >>> 4 else b & 0xf)
              p += 1
            }
            val c = salt * slices + slice
            if (mins(c) == null || compareBytes(cand, mins(c)) < 0) mins(c) = cand
            slice += 1
          }
          salt += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](components)
    var c = 0
    while (c < components) {
      out(c) = if (mins(c) == null) null else UTF8String.fromBytes(mins(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Lexicographic compare of equal-length ASCII hex strings. */
  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }
}
