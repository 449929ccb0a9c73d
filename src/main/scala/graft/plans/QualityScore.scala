package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass composite quality score (the fused form of
  * TextFunctions.qualityScoreDeclarative): length, English-stopword
  * density, clean-character share, and mean word length, all derived
  * from ONE code-point scan.
  *
  * The declarative form costs four regex passes per document (token
  * split, stopword filter via the token array, two regexp_replace
  * length probes) — per-row work that dominates the q21/q61/q86
  * quality paths. This expression folds every count into a single
  * scan with no regex engine and no intermediate arrays, and the
  * final arithmetic replays the declarative operation order exactly
  * (same doubles bit for bit — QualityScoreSpec pins equality, the
  * DuckDB oracles keep speaking the declarative SQL).
  *
  * Whitespace is Java regex \\s = [ \\t\\n\\u000B\\f\\r] (what the
  * declarative split/replace used); "clean" characters are
  * [a-zA-Z0-9 ] (what its character-class regex kept); counts are
  * code points (what Spark's length() counts).
  */
case class QualityScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(input: Any): Any =
    QualityScore.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.QualityScore.score($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

object QualityScore {

  /** The en stopword profile — MUST stay in sync with
    * TextFunctions.stopwords.head; QualityScoreSpec pins the identity.
    */
  private[plans] val enStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that")
      .foreach(s.add)
    s
  }

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Called from generated code — must stay a static-friendly object
    * method (same rule as PolyHash.hash).
    */
  def score(s: UTF8String): Double = {
    val str = s.toString
    var i = 0
    var chars = 0L // code points (Spark length())
    var clean = 0L // [a-zA-Z0-9 ]
    var nonWs = 0L // non-\s code points (the mean-word-length numerator)
    var nToks = 0L
    var stops = 0L
    val tok = new java.lang.StringBuilder
    while (i < str.length) {
      val cp = str.codePointAt(i)
      chars += 1
      if (isWs(cp)) {
        if (tok.length > 0) {
          nToks += 1
          if (enStops.contains(tok.toString)) stops += 1
          tok.setLength(0)
        }
      } else {
        nonWs += 1
        tok.appendCodePoint(cp)
      }
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == ' ') clean += 1
      i += Character.charCount(cp)
    }
    if (tok.length > 0) {
      nToks += 1
      if (enStops.contains(tok.toString)) stops += 1
    }
    // EXACT declarative operation order (bit-for-bit doubles)
    val charsD = chars.toDouble
    val nToksD = nToks.toDouble
    val lenScore = math.min(charsD / 500.0, 1.0)
    val stopScore = if (nToksD > 0) stops.toDouble / nToksD else 0.0
    val cleanScore = if (charsD > 0) clean.toDouble / charsD else 0.0
    val wordScore =
      if (nToksD > 0) math.min(nonWs.toDouble / nToksD / 8.0, 1.0) else 0.0
    lenScore * 0.25 + stopScore * 0.25 + cleanScore * 0.25 + wordScore * 0.25
  }
}
