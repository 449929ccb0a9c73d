package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile state is trustworthy when every path — one-shot,
  * two-way batched, three-way batched — lands each estimate within
  * the sketch's normalized-rank guarantee of the exact quantile.
  * (Compaction is randomized, so estimates are checked by RANK, not
  * compared bit-for-bit.)
  */
class IncrementalQuantilesSpec extends SparkSpec {

  private val keys = Seq("o_orderpriority")
  // KLL k=200 two-sided normalized rank error is ~1.65%; allow 3%
  // to keep the test stable across the randomized compaction paths
  private val rankTol = 0.03

  /** For each group: assert each estimated quantile's TRUE normalized
    * rank is within tolerance of the target φ.
    */
  private def assertRankError(
      estimates: Map[String, (Long, Double, Double, Double)]): Unit = {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
      .select(col("o_orderpriority").as("k"), col("o_totalprice").cast("double").as("v"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(estimates.keySet == orders.keySet)
    estimates.foreach { case (k, (n, p25, p50, p75)) =>
      val vs = orders(k)
      assert(n == vs.length, s"$k: exact row count must batch losslessly")
      Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75).foreach { case (phi, est) =>
        // true normalized rank of the estimate (KLL returns a real
        // data value, so it has a well-defined rank)
        val below = vs.count(_ <= est).toDouble / vs.length
        val above = vs.count(_ < est).toDouble / vs.length
        val dist = math.min(math.abs(below - phi), math.abs(above - phi))
        assert(dist <= rankTol, s"$k phi=$phi est=$est rank=[$above,$below]")
      }
    }
  }

  private def collectEstimates(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("one-shot estimates are within KLL rank error of exact quantiles") {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
    assertRankError(collectEstimates(
      IncrementalQuantiles.finish(
        IncrementalQuantiles.state(orders, keys, "o_totalprice"), keys)))
  }

  test("incremental (2-way) and 3-way batched estimates hold the same guarantee") {
    val orders = graft.Tables.load(spark, sf("sf0.01"), "orders")
    val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
    val twoWay = IncrementalQuantiles.merge(Seq(
      IncrementalQuantiles.state(
        orders.filter(col("o_orderdate") < cutoff), keys, "o_totalprice"),
      IncrementalQuantiles.state(
        orders.filter(col("o_orderdate") >= cutoff), keys, "o_totalprice")), keys)
    assertRankError(collectEstimates(IncrementalQuantiles.finish(twoWay, keys)))
    val h = abs(hash(col("o_orderkey"))) % 3
    val threeWay = IncrementalQuantiles.merge((0 until 3).map(i =>
      IncrementalQuantiles.state(orders.filter(h === i), keys, "o_totalprice")), keys)
    assertRankError(collectEstimates(IncrementalQuantiles.finish(threeWay, keys)))
  }
}
