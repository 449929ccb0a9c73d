package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndBucketingSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(0, 20000)
      .select(
        when(col("id") % 10 =!= 0, "HOT").otherwise(concat(lit("k"), col("id"))).as("k"),
        (col("id") % 97).cast("double").as("v"),
        col("id"))
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.countAndSum(skewed, col("k"), col("id"), col("v"), nSalts = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
    // the salted phase genuinely splits the hot key
    val phase1 = skewed.groupBy(col("k"), Skew.salt(16, col("id")).as("s"))
      .count().filter(col("k") === "HOT")
    assert(phase1.count() == 16)
  }

  test("AQE splits a skewed join partition at runtime") {
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so the local hot partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      // ~95% of fact rows share key 0, with a wide payload
      val fact = spark.range(0, 50000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("x" * 200), col("id")).as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"), col("id").as("attr"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS Dataset's queryExecution (a write would
      // plan a separate one and leave this plan isFinalPlan=false)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate: join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = graft.Tables.load(spark, sf(), "orders")
    val customer = graft.Tables.load(spark, sf(), "customer")
    orders.write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").mode("overwrite")
      .saveAsTable("orders_bucketed")
    customer.write.format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").mode("overwrite")
      .saveAsTable("customer_bucketed")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
