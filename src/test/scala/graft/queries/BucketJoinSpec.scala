package graft.queries

import graft.SparkSpec

/** q124's whole point is the PLAN, not the rows: a bucket-aligned
  * sort-merge join must consume the bucket layout of both scans —
  * zero Exchange anywhere in the executed join, and no per-query
  * re-sort of data already sorted within buckets. Row equality with
  * the unbucketed join is the layout-never-changes-answers half.
  */
class BucketJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucket-aligned SMJ has zero Exchange and matches the plain join") {
    val work = java.nio.file.Files.createTempDirectory("bktspec").toString
    val joined = ChangeCapture.bucketedOrdersCustomer(spark, sf, work)
    val n = joined.count() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"bucket join must not shuffle:\n$plan")
    val plain = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .count()
    assert(n === plain)
  }
}
