package graft.plans

import graft.SparkSpec
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Pins the native [[SimHashSig]] expression to the declarative
  * simhashSinglePassSpark form (the layout the DuckDB oracle speaks),
  * value-for-value over real documents and at more than one width.
  */
class SimHashSigSpec extends SparkSpec {

  private def both(width: Int) = {
    import graft.Tables
    Tables.load(spark, sf(), "documents")
      .withColumn("toks", T.tokens(col("text")))
      .withColumn("hs", transform(col("toks"), t => md5(t)))
      .select(
        col("doc_id"),
        call_function("simhash_sig", col("toks"), lit(width)).as("native"),
        expr(H.simhashSinglePassSpark(width)).as("declarative"))
  }

  test("native fingerprint equals the declarative single-pass form on real docs") {
    Seq(16, 24).foreach { w =>
      val rows = both(w).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"width $w doc ${r.getLong(0)}")
      }
    }
  }

  test("edge cases: empty token array fingerprints to 0; null text to null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("one two three"), None).toDF("text")
      .withColumn("toks", T.tokens(col("text")))
      .withColumn("hs", transform(col("toks"), t => md5(t)))
      .select(
        call_function("simhash_sig", col("toks"), lit(16)).as("native"),
        expr(H.simhashSinglePassSpark(16)).as("declarative"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    // empty tokens: all votes 0, no bit positive
    assert(rows(0).getLong(0) == 0L)
  }

  test("width guard rejects out-of-range widths") {
    intercept[Exception] {
      spark.range(1).select(
        call_function("simhash_sig", array(lit("x")), lit(63))).collect()
    }
  }
}
