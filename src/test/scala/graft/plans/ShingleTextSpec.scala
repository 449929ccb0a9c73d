package graft.plans

import graft.SparkSpec
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** The native fused shingler must equal the declarative
  * tokens→shingles composition value-for-value — the DuckDB oracles
  * speak the declarative form, so any divergence here is an oracle
  * break in disguise.
  */
class ShingleTextSpec extends SparkSpec {

  private def declarative(c: org.apache.spark.sql.Column) =
    H.shingles(T.tokens(c))

  test("native shingles equal the declarative composition on real docs") {
    val rows = graft.Tables.load(spark, sf(), "documents")
      .select(
        col("doc_id"),
        call_function("shingles3", col("text")).as("native"),
        declarative(col("text")).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.get(0)}")
    }
  }

  test("edge cases: whitespace variants, multi-byte UTF-8, short docs") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "",                      // no tokens
      "   ",                   // spaces only
      "\t\n\f\r",        // every \s class, no tokens
      "one two",               // below shingle width
      "one two three",         // exactly one shingle
      "  a\tb\nc  d ",         // mixed separators + padding
      "a  b   c",              // multi-space runs collapse
      "café naïve 日本語 tok", // multi-byte UTF-8
      "x y a b c")        // NBSP is NOT \s — stays inside a token
    val out = cases.toDF("text")
      .select(
        call_function("shingles3", col("text")).as("native"),
        declarative(col("text")).as("decl"))
      .collect()
    out.zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input '$c'")
    }
    // NBSP case: the two-codepoint token survives intact
    assert(out.last.getSeq[String](0).head.startsWith("x y "))
  }

  test("shingle stage codegens end-to-end over a file scan") {
    // shingles3 + minhash_sig keeps the whole signature projection
    // inside whole-stage codegen — the lambda chain it replaces forced
    // the projection interpreted (a real file scan is required here:
    // LocalRelation projections get constant-folded away)
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-shingle-").toString
    try {
      Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
        .write.parquet(s"$work/docs")
      val plan = spark.read.parquet(s"$work/docs")
        .select(col("doc_id"), call_function("shingles3", col("text")).as("sh"))
        .withColumn("sig", call_function("minhash_sig", col("sh")))
        .queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project \[.*shingles3""".r.findFirstIn(plan).isDefined, plan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }
}
