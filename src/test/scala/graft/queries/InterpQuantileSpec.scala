package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins q187's type-7 interpolation against a sequential exact
  * replica on the real events table, and a hand case where the
  * interpolation weight is non-trivial (r = 1, 2, 3 all exercised).
  */
class InterpQuantileSpec extends SparkSpec {

  test("q187: hand case — n=6 exercises weights 1/4, 2/4, 3/4") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iq").toString
    def ts = Timestamp.valueOf("2024-01-10 10:00:00")
    // cents 100..600: h25 = 5/4 → 1 + 1/4 → (3·200 + 1·300)/4 = 225.00
    // h50 = 10/4 → 2 + 2/4 → (2·300 + 2·400)/4 = 350.00
    // h75 = 15/4 → 3 + 3/4 → (1·400 + 3·500)/4 = 475.00
    val ev = (1 to 6).map(i => (i.toLong, ts, 1L, "click", i.toDouble, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = DistributionQueries.q187_interp_quantiles(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === (6L, 225000000L, 350000000L, 475000000L))
  }

  test("q187: matches the exact type-7 replica per event type on real data") {
    val byType = graft.Tables.load(spark, sf(), "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.sortBy(r => (r._3, r._2)).map(_._3).toIndexedSeq }
    val expect = byType.map { case (t, xs) =>
      val n = xs.length
      def q(num: Int): Long = {
        val h = (n - 1).toLong * num
        val k = (h / 4).toInt; val r = h % 4
        val second = if (r == 0) 0L else xs(k + 1)
        ((4 - r) * xs(k) + r * second) * 250000L
      }
      t -> ((n.toLong, q(1), q(2), q(3)))
    }
    val got = DistributionQueries.q187_interp_quantiles(spark, sf()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }
}
