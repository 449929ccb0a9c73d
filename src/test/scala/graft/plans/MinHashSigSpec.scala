package graft.plans

import graft.SparkSpec
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** The native one-pass signature must equal the declarative
  * salted-md5 slice composition value-for-value — the DuckDB oracles
  * speak the declarative form, so any divergence here is an oracle
  * break in disguise.
  */
class MinHashSigSpec extends SparkSpec {

  test("native signature equals the declarative composition on real docs") {
    val sh = graft.Tables.load(spark, sf(), "documents")
      .withColumn("toks", T.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), H.shingles(col("toks")).as("sh"))
      .withColumn("hs0", H.saltedHashes(col("sh"), 0))
      .withColumn("hs1", H.saltedHashes(col("sh"), 1))
    val rows = sh.select(
      col("doc_id"),
      call_function("minhash_sig", col("sh")).as("native"),
      array((0 until 12).map(i =>
        H.minhashFromHashes(col(s"hs${i / 6}"), i % 6)): _*).as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("edge cases: empty array gives 12 nulls; null elements are skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("only one")),
      (3L, Seq(null, "a b c", null))).toDF("id", "sh")
    val out = df.select(col("id"), call_function("minhash_sig", col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).size == 12 && out(1L).forall(_ == null))
    assert(out(2L).forall(_ != null))
    // null elements contribute nothing: same as the one-element array
    val one = df.filter(col("id") === 2L)
      .select(call_function("minhash_sig", array(lit("a b c"))).as("sig"))
      .head().getSeq[String](0)
    assert(out(3L) == one)
  }

  test("expression codegens when its projection is free of lambda HOFs") {
    // over a plain stored array column the projection stays inside
    // whole-stage codegen (in sigTable the tokenizer/shingle lambdas
    // in the same projection force interpreted mode for everything —
    // the expression's win there is the fused single pass, not WSCG)
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mhsig-").toString
    try {
      Seq((1L, Seq("a b c", "b c d"))).toDF("id", "sh")
        .write.parquet(s"$work/sh")
      val plan = spark.read.parquet(s"$work/sh")
        .select(call_function("minhash_sig", col("sh")))
        .queryExecution.executedPlan.toString
      // the "*(n)" prefix marks a whole-stage-codegen'd operator
      assert("""\*\(\d+\) Project \[minhash_sig""".r.findFirstIn(plan).isDefined, plan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }
}
