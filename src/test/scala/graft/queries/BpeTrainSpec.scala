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
    // reproducible end to end
    val again = BpeTrain.q92_bpe_train(spark, dir).collect()
    assert(out.toSeq == again.toSeq)
  }
}
