package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins q182 (a holding FD vs a planted violation), q183 (hand-traced
  * Tukey fences flag exactly the planted extreme), and q184 (the
  * generated calendar finds exactly the missing day, epoch-sum
  * pinned).
  */
class AuditOpsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q182: holding and violated dependencies measured exactly") {
    import spark.implicits._
    val dir = tmp("fd")
    // nation: n_nationkey -> n_regionkey HOLDS (keys unique)
    Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // part: p_brand -> p_type VIOLATED by brand B1 (2 types); reverse holds
    Seq((1L, "B1", "tin"), (2L, "B1", "zinc"), (3L, "B2", "tin"))
      .toDF("p_partkey", "p_brand", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "SEG")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "O")).toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = GovernanceQueries.q182_fd_discovery(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("nation: n_nationkey -> n_regionkey") === ((3L, 0L, 1L, 0L, true)))
    assert(got("part: p_brand -> p_type") === ((2L, 1L, 2L, 500000L, false)))
    assert(got("part: p_type -> p_brand") === ((2L, 1L, 2L, 500000L, false)))
  }

  test("q183: the planted extreme is the only row outside the Tukey fences") {
    import spark.implicits._
    val dir = tmp("iqr")
    def ts = Timestamp.valueOf("2024-01-10 10:00:00")
    val vals = (0 to 10).map(i => 10.0 + i) :+ 1000.0 // cents 1000..2000, 100000
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, ts, 1L, "click", v, "{}") }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = DistributionQueries.q183_iqr_outliers(spark, dir).collect().head
    // n=12 → q1 at rank 3 (1200), q3 at rank 9 (1800);
    // high fence: 2x > 5·1800 − 3·1200 = 5400 → only the 100000-cent row
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) === (12L, 1200L, 1800L, 0L, 1L, 12L))
  }

  test("q184: the generated calendar pins the exact missing day") {
    import spark.implicits._
    val dir = tmp("cov")
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "view", 0.0, "{}"),
      (3L, ts(4), 1L, "view", 0.0, "{}"), // Jan 3 silently missing
      (4L, ts(1), 1L, "click", 0.0, "{}")) // single-day type: no gaps
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DistributionQueries.q184_coverage_gaps(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val jan3 = java.time.LocalDate.parse("2024-01-03").toEpochDay
    assert(got("view") === (("2024-01-01", "2024-01-04", 4L, 3L, 1L, jan3)))
    assert(got("click") === (("2024-01-01", "2024-01-01", 1L, 1L, 0L, 0L)))
  }
}
