package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TokenCountSpec extends SparkSpec {

  test("native count matches the Java-regex semantics on real docs") {
    val s = spark
    import s.implicits._
    val texts = graft.Tables.load(spark, sf(), "documents")
      .select("text").as[String].collect()
    texts.foreach { t =>
      val viaRegex = t.trim.split("\\s+").count(_.nonEmpty)
      val viaScan = TokenCount.count(UTF8String.fromString(t))
      assert(viaScan == viaRegex, s"mismatch on: '$t'")
    }
  }

  test("edge cases: empty, padded, tabs/newlines, unicode") {
    def c(s: String) = TokenCount.count(UTF8String.fromString(s))
    assert(c("") == 0)
    assert(c("   ") == 0)
    assert(c(" a ") == 1)
    assert(c("a\tb\nc\rd") == 4)
    assert(c("héllo wörld") == 2)
    assert(c(" ") == 1) // NBSP is NOT \s — one token, same as regex
  }

  test("optimizer rule rewrites the declarative pattern") {
    val df = graft.Tables.load(spark, sf(), "documents")
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("token_count"), s"rule did not fire:\n$optimized")
  }

  test("registered token_count SQL function agrees with the rewritten declarative form") {
    graft.Tables.load(spark, sf(), "documents").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql("SELECT sum(token_count(text)) FROM docs_ext")
      .collect()(0).getLong(0)
    val viaDf = graft.Tables.load(spark, sf(), "documents")
      .agg(sum(size(graft.functions.TextFunctions.tokens(col("text")))))
      .collect()(0).getLong(0)
    assert(viaSql == viaDf)
  }
}
