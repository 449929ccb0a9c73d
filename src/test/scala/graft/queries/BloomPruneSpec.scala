package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q49's bloom membership test must run as Spark's native codegen'd
  * BloomFilterMightContain, not a per-row Scala UDF breaking the
  * fact-scan's whole-stage-codegen span.
  */
class BloomPruneSpec extends SparkSpec {

  test("bloom prune plans the native might_contain expression, no UDF on the scan") {
    val df = GraphQueries.q49_bloom_prune(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native bloom expression missing:\n$plan")
    assert(!plan.contains("UDF"), s"scan-side Scala UDF survived:\n$plan")
  }

  test("bloom prune result equals the plain join (false positives discarded)") {
    val got = GraphQueries.q49_bloom_prune(spark, sf()).collect()
    val nat = graft.Tables.load(spark, sf(), "nation")
      .filter(col("n_name") === "NATION_7")
    val supp = graft.Tables.load(spark, sf(), "supplier")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long").as("s_suppkey"))
    val want = graft.Tables.load(spark, sf(), "lineitem")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("s_suppkey").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }
}
