package graft.queries

import graft.SparkSpec

/** Pins q194 on a hand fixture where the weighted and unweighted
  * medians DISAGREE (one heavy line outvotes many light ones), and
  * against a sequential replica on real data.
  */
class WeightedMedianSpec extends SparkSpec {

  test("q194: one heavy line outvotes four light ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    // prices 1..5 (cents 100..500), qty 1 each except price 5 at qty 10:
    // W = 14; crossing 2*cumW >= 14 at cumW >= 7 → the qty-10 row (500)
    // plain median over 5 lines = rank 3 → 300
    val rows = Seq(
      (1L, 1, 1.0, 1.0), (1L, 2, 2.0, 1.0), (1L, 3, 3.0, 1.0),
      (1L, 4, 4.0, 1.0), (1L, 5, 5.0, 10.0))
    rows.map { case (ok, ln, p, q) => (ok, ln, "N", p, q) }
      .toDF("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = DistributionQueries.q194_weighted_median(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === (5L, 14L, 500L, 300L))
  }

  test("q194: matches a sequential replica on the real lineitem table") {
    val rows = graft.Tables.load(spark, sf(), "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        math.round(r.getDouble(3) * 100), math.round(r.getDouble(4))))
    val expect = rows.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.sortBy(r => (r._4, r._2, r._3))
      val wtot = sorted.map(_._5).sum
      var cum = 0L
      val wm = sorted.find { r => cum += r._5; cum * 2 >= wtot }.get._4
      val med = sorted((sorted.length + 1) / 2 - 1)._4
      f -> ((sorted.length.toLong, wtot, wm, med))
    }
    val got = DistributionQueries.q194_weighted_median(spark, sf()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }
}
