package graft.queries

import graft.SparkSpec

/** Hand-computed bigram-LM fixtures: corpus counts
  * "a b"→2, "b a"→2, "a c"→1; prefixes a→3, b→2. Contributions in
  * micro-units: "a b" = 2000000 div 3 = 666666, "b a" = 1000000,
  * "a c" = 333333.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def score(rows: (Long, String, String)*) =
    LanguageModel.scoreDocs(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("fluency is the exact integer mean of scaled conditional frequencies") {
    val out = score(
      (1L, "s", "a b a b a"), // bigrams: ab ba ab ba
      (2L, "s", "a c"))
    // d1: (666666*2 + 1000000*2) div 4 = 3333332 div 4 = 833333
    assert(out(1L) === ((4L, 833333L)))
    // d2: 333333 div 1
    assert(out(2L) === ((1L, 333333L)))
  }

  test("repetitive text scores the maximum; unique text scores low") {
    val out = score(
      (1L, "s", "x x x x x x x x"),     // only bigram "x x": p=1
      (2L, "s", "q w e r t y u i o p")) // every bigram unique, every prefix unique
    assert(out(1L)._2 === 1000000L)
    // all-unique corpus-wide bigrams with shared-nothing prefixes → p = 1 too,
    // UNLESS prefixes repeat across docs; here they don't, so pin exactly:
    assert(out(2L)._2 === 1000000L)
    // the discriminating case: the same prefix fanning out lowers the score
    val fanned = score(
      (1L, "s", "the cat"), (2L, "s", "the dog"),
      (3L, "s", "the cat"), (4L, "s", "the bird"))
    // "the cat": c=2, prefix "the"=4 -> 500000; "the dog"/"the bird": 250000
    assert(fanned(1L)._2 === 500000L)
    assert(fanned(2L)._2 === 250000L)
  }

  test("tokenization is lower-cased: 'The' and 'the' share statistics") {
    val out = score((1L, "s", "The cat"), (2L, "s", "the cat"))
    assert(out(1L) === out(2L)) // identical bigram after lowering
    assert(out(1L)._2 === 1000000L)
  }

  test("single-token and empty docs are excluded (no bigram to score)") {
    val out = score((1L, "s", "only"), (2L, "s", "  "), (3L, "s", "a b"))
    assert(out.keySet === Set(3L))
  }
}
