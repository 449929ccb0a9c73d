package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c).collect()(0).get(0)
  }

  test("tokens handles empty, padded, and multi-space text") {
    assert(one(size(TextFunctions.tokens(col("text"))), "") == 0)
    assert(one(size(TextFunctions.tokens(col("text"))), "  a  b   c ") == 3)
  }

  test("bpe-ish counting splits letter runs, digits, punctuation") {
    assert(one(TextFunctions.bpeTokenCount(col("text")), "abc 123 x.y!") == 6)
  }

  test("langId prefers highest-scoring profile, und on zero") {
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))),
      "the cat and the dog") == "en")
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))),
      "der hund ist nicht da und") == "de")
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))),
      "zzz qqq") == "und")
  }

  test("fingerprint is deterministic and content-sensitive") {
    val a = one(TextFunctions.fingerprint(col("text")), "hello world")
    val b = one(TextFunctions.fingerprint(col("text")), "hello world")
    val c = one(TextFunctions.fingerprint(col("text")), "hello worle")
    assert(a == b && a != c)
  }

  test("quality score stays within [0,1]") {
    val s = spark
    import s.implicits._
    val scores = graft.Tables.load(spark, sf(), "documents")
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .as[Double].collect()
    assert(scores.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("shingles produce w=3 windows in order") {
    val sh = one(HashFunctions.shingles(TextFunctions.tokens(col("text"))),
      "a b c d").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toList == List("a b c", "b c d"))
  }

  test("shingles are total: short and empty docs yield empty arrays") {
    for (text <- Seq("", "a", "a b", "a b c")) {
      val sh = one(HashFunctions.shingles(TextFunctions.tokens(col("text"))), text)
        .asInstanceOf[scala.collection.Seq[String]]
      assert(sh.toList == (if (text == "a b c") List("a b c") else Nil),
        s"for input '$text'")
    }
  }

  test("minhash: identical docs share signatures; disjoint docs differ") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "q r s t u v w x y z")).toDF("id", "text")
    val sig = df.select(col("id") +: (0 until 4).map(i =>
      HashFunctions.minhash(
        HashFunctions.shingles(TextFunctions.tokens(col("text"))), i).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString).toList).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }
}
