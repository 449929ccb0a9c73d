package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native fused normalization must equal the declarative
  * lower → class-filter → space-collapse → trim chain exactly.
  */
class NormalizeTextSpec extends SparkSpec {

  private def declarative(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  test("native == declarative on the documents corpus") {
    val diff = graft.Tables.load(spark, sf(), "documents")
      .select(
        call_function("normalize_text", col("text")).as("native"),
        declarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0)
  }

  test("native == declarative on edge fixtures") {
    import spark.implicits._
    val fixtures = Seq(
      "",
      "   ",
      "Hello, World!",
      "a.b",                    // dropped char does NOT become a space
      "a . b",                  // but real spaces around it collapse
      "  leading and trailing  ",
      "MiXeD 123 CaSe",
      "tabs\tand\nnewlines stay dropped, not spaced",
      "ünïcödé Çhars",          // accented letters drop (not a-z)
      "\u212A is the Kelvin sign", // special lowercase mapping (U+212A -> k)
      new String(Character.toChars(0x1F600)) + " emoji 42",
      "a" * 300 + "  " + "b" * 300)
    val diff = fixtures.toDF("text")
      .select(
        call_function("normalize_text", col("text")).as("native"),
        declarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0)
  }
}
