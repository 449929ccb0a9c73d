package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** The native one-pass language ID must equal the declarative
  * per-profile-filter argmax — on the real corpus and on the tie /
  * empty / multi-profile shapes the argmax rule is subtle about.
  */
class LangIdSpec extends SparkSpec {

  test("native == declarative on the documents corpus") {
    val diff = graft.Tables.load(spark, sf(), "documents")
      .withColumn("toks", T.tokens(col("text")))
      .select(
        T.langId(col("toks")).as("native"),
        T.langIdDeclarative(col("toks")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0)
  }

  test("native == declarative on argmax edge fixtures") {
    import spark.implicits._
    val fixtures: Seq[Seq[String]] = Seq(
      Seq.empty,                              // no tokens -> und
      Seq("zzz", "qqq"),                      // no profile hits -> und
      Seq("the"),                             // single en hit
      Seq("the", "der"),                      // en/de tie -> earliest (en)
      Seq("der", "the"),                      // order of tokens irrelevant
      Seq("der", "der", "the"),               // de strictly wins
      Seq("le", "la", "the", "und"),          // fr beats en 2-1
      Seq("es", "es", "est", "ist", "is"),    // es 2, fr 1, de 1, en 1
      Seq("the", "a", "der", "die", "le", "la", "el", "los")) // 4-way tie -> en
    val df = fixtures.toDF("toks")
      .select(
        T.langId(col("toks")).as("native"),
        T.langIdDeclarative(col("toks")).as("decl"))
    assert(df.filter(col("native") =!= col("decl")).count() == 0)
    // and the tie rule really is declaration order
    val first = df.collect().map(_.getString(0))
    assert(first(3) == "en" && first(8) == "en")
  }
}
