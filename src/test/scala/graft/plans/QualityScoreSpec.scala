package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** The native one-pass quality score must equal the declarative
  * four-regex-pass composite bit for bit — on the real corpus and on
  * the edge shapes regexes are subtle about.
  */
class QualityScoreSpec extends SparkSpec {

  test("native == declarative on the documents corpus, bit for bit") {
    val diff = graft.Tables.load(spark, sf(), "documents")
      .select(
        T.qualityScore(col("text")).as("native"),
        T.qualityScoreDeclarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0)
  }

  test("native == declarative on edge fixtures") {
    import spark.implicits._
    val fixtures = Seq(
      "",                       // empty: every guard branch
      "   ",                    // whitespace only: zero tokens
      "the",                    // single stopword
      "the the the",            // all stopwords
      "a\tb\nc\rd\fe",          // every \s class member as separator
      "!!! ??? ...",            // zero clean chars beyond spaces
      "x" * 600,                // past the length-score cap
      "The THE tHe",            // stopword matching is case-sensitive
      "word, the. and!",        // punctuation glued to tokens
      "café über straße", // non-ASCII letters (not clean)
      "a\u0001b",               // control char: neither \s nor clean
      new String(Character.toChars(0x1F600)) + " the") // surrogate pair
    val diff = fixtures.toDF("text")
      .select(
        T.qualityScore(col("text")).as("native"),
        T.qualityScoreDeclarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0)
  }

  test("the stopword set matches TextFunctions' en profile") {
    val want = T.stopwords.head._2.toSet
    import scala.jdk.CollectionConverters._
    assert(QualityScore.enStops.asScala.toSet == want)
  }
}
