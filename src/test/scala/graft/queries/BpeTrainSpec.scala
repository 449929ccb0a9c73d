package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q92's correctness weight (it is rows-only at the driver): round-1
  * argmax against an independent recomputation, the non-increasing
  * pair-count invariant, merge-rule unit behavior, and cross-run
  * determinism.
  */
class BpeTrainSpec extends SparkSpec {

  test("mergePair merges leftmost-first without overlap") {
    import BpeTrain.mergePair
    assert(mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergePair(Seq("t", "h", "e"), "t", "h") == Seq("th", "e"))
    assert(mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(mergePair(Seq.empty, "a", "b") == Seq.empty)
  }

  test("mergePair property: agrees with an independent recursive reference on random runs") {
    import BpeTrain.mergePair
    // independent leftmost-first semantics, written structurally
    // differently (pattern-matching recursion vs index loop)
    def ref(syms: List[String], a: String, b: String): List[String] = syms match {
      case s0 :: s1 :: rest if s0 == a && s1 == b => (a + b) :: ref(rest, a, b)
      case s0 :: rest => s0 :: ref(rest, a, b)
      case Nil => Nil
    }
    val rnd = new scala.util.Random(92)
    val alphabet = Vector("a", "b", "c", "aa", "ab")
    for (_ <- 1 to 500) {
      val syms = List.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
      val a = alphabet(rnd.nextInt(alphabet.length))
      val b = alphabet(rnd.nextInt(alphabet.length))
      assert(mergePair(syms, a, b) == ref(syms, a, b),
        s"syms=$syms merge=($a,$b)")
      // conservation: flattening the result reproduces the input text
      assert(mergePair(syms, a, b).mkString == syms.mkString)
    }
  }

  test("symbolize splits by code point, never through a surrogate pair") {
    import BpeTrain.symbolize
    assert(symbolize("the") == Seq("t", "h", "e"))
    assert(symbolize("") == Seq.empty)
    val emoji = new String(Character.toChars(0x1F600)) // supplementary plane
    assert(symbolize(s"a${emoji}b") == Seq("a", emoji, "b"))
    // every symbol is a well-formed single code point
    symbolize(s"$emoji$emoji").foreach { s =>
      assert(s.codePointCount(0, s.length) == 1)
      assert(!Character.isSurrogate(s.charAt(0)) || s.length == 2)
    }
  }

  test("q92: first merge is the true weighted bigram argmax; counts non-increasing; deterministic") {
    val dir = sf("sf0.01")
    val out = BpeTrain.q92_bpe_train(spark, dir).collect()
    assert(out.length == BpeTrain.bpeMerges)
    assert(out.map(_.getInt(0)).toSeq == (0 until BpeTrain.bpeMerges))
    // a merged pair's occurrences each come from a pre-existing
    // occurrence of some earlier-round pair, so the argmax sequence
    // can never increase
    out.map(_.getLong(3)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    // independent round-1 recomputation: weighted char-bigram counts
    val s = spark
    import s.implicits._
    val expected = BpeTrain.wordFreq(spark, dir)
      .as[(String, Long)]
      .flatMap { case (w, f) => w.sliding(2).filter(_.length == 2)
        .map(bg => (bg(0).toString, bg(1).toString, f)) }
      .toDF("left", "right", "f")
      .groupBy("left", "right").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("left"), col("right"))
      .head()
    assert(out(0).getString(1) == expected.getString(0))
    assert(out(0).getString(2) == expected.getString(1))
    assert(out(0).getLong(3) == expected.getLong(2))
    // reproducible end to end: a FRESH training run (bypassing the
    // per-dir merge memo) must reproduce the reported table exactly
    val again = BpeTrain.train(spark, dir)
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      == again)
  }

  test("encode applies merges in rank order, leftmost-first per merge") {
    import BpeTrain.encode
    assert(encode(Seq("t" -> "h", "th" -> "e"), "the") == Seq("the"))
    assert(encode(Seq("a" -> "a"), "aaaa") == Seq("aa", "aa"))
    assert(encode(Seq("a" -> "a"), "aaa") == Seq("aa", "a"))
    // later merges see the output of earlier ones, not raw symbols
    assert(encode(Seq("a" -> "b", "ab" -> "ab"), "abab") == Seq("abab"))
    // zero merges = code-point identity
    assert(encode(Seq.empty, "the") == Seq("t", "h", "e"))
  }

  test("q93: full coverage accounting and compression >= 1 per source") {
    val dir = sf("sf0.01")
    val out = BpeTrain.q93_bpe_apply(spark, dir).collect()
    assert(out.nonEmpty)
    // every corpus token matched the vocabulary (it IS the distinct
    // tokens), so word accounting must cover the corpus exactly
    val corpusWords = graft.Tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w").isNotNull).count().collect().map(_.getLong(1)).sum
    assert(out.map(_.getLong(1)).sum == corpusWords)
    out.foreach { r =>
      // merging can only shrink: n_tokens <= n_symbols, ratio >= 1
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getDouble(4) >= 1.0)
    }
  }
}
