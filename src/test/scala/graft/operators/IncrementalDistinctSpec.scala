package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** What makes HLL state trustworthy as INCREMENTAL state: merging
  * per-batch sketches is lossless over sketch state (register-wise
  * max), so however ingestion is batched the estimate stays within
  * the sketch's error band — pinned here as: incremental within 2%
  * of the full-rescan estimate (sketch internals may promote
  * differently, so bytes are not compared), and every estimate
  * within 5% of the exact count.
  */
class IncrementalDistinctSpec extends SparkSpec {

  private val keys = Seq("o_orderpriority")

  test("incremental merge tracks the full-rescan estimate") {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
    val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
    val incremental = IncrementalDistinct.finish(
      IncrementalDistinct.merge(Seq(
        IncrementalDistinct.state(
          orders.filter(col("o_orderdate") < cutoff), keys, "o_custkey"),
        IncrementalDistinct.state(
          orders.filter(col("o_orderdate") >= cutoff), keys, "o_custkey")), keys),
      keys).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rescan = IncrementalDistinct.finish(
      IncrementalDistinct.state(orders, keys, "o_custkey"), keys)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rescanMap = rescan.map(t => t._1 -> t).toMap
    incremental.foreach { case (k, n, est) =>
      val (_, nR, estR) = rescanMap(k)
      assert(n == nR, s"$k: exact row count must batch losslessly")
      val rel = math.abs(est - estR).toDouble / estR
      assert(rel < 0.02, s"$k: incremental=$est rescan=$estR rel=$rel")
    }
  }

  test("estimate within 5% of the exact distinct count per group") {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
    val est = IncrementalDistinct.finish(
      IncrementalDistinct.state(orders, keys, "o_custkey"), keys)
      .select(col("o_orderpriority"), col("approx_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val rel = math.abs(est(k) - ex).toDouble / ex.toDouble
      assert(rel < 0.05, s"$k: est=${est(k)} exact=$ex rel=$rel")
    }
  }

  test("three-way batching tracks the one-shot estimate too") {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
    val h = abs(hash(col("o_orderkey"))) % 3
    val parts = (0 until 3).map(i =>
      IncrementalDistinct.state(orders.filter(h === i), keys, "o_custkey"))
    val threeWay = IncrementalDistinct.finish(
      IncrementalDistinct.merge(parts, keys), keys)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val oneShot = IncrementalDistinct.finish(
      IncrementalDistinct.state(orders, keys, "o_custkey"), keys)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val oneMap = oneShot.map(t => t._1 -> t).toMap
    threeWay.foreach { case (k, n, est) =>
      val (_, nR, estR) = oneMap(k)
      assert(n == nR)
      assert(math.abs(est - estR).toDouble / estR < 0.02,
        s"$k: threeWay=$est oneShot=$estR")
    }
  }
}
