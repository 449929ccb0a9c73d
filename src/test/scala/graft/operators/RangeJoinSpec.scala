package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private lazy val ivs = {
    val s = spark
    import s.implicits._
    RangeJoin.Intervals(
      Seq(("a", 0.0, 10.0), ("b", 10.0, 47.5), ("c", 47.5, 300.0))
        .toDF("band", "lo", "hi"), "lo", "hi")
  }

  test("binned range join equals the broadcast nested-loop reference") {
    val events = graft.Tables.load(spark, sf(), "events")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "band").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
    val reference = key(RangeJoin.broadcastRange(events, col("value"), ivs))
    val viaBins = key(RangeJoin.binned(events, col("value"), ivs, 25.0))
    assert(viaBins == reference)
    assert(reference.nonEmpty)
  }

  test("hi just above a bin boundary still matches points in the last bin") {
    val s = spark
    import s.implicits._
    // hi = 50.0000000005: the former epsilon form capped the bin list
    // at bin 1 and silently dropped the true match at v = 50.0000000002
    val iv = RangeJoin.Intervals(
      Seq(("x", 0.0, 50.0000000005)).toDF("band", "lo", "hi"), "lo", "hi")
    val pts = Seq((1L, 50.0000000002), (2L, 50.0000000009)).toDF("id", "v")
    val got = RangeJoin.binned(pts, col("v"), iv, 25.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("degenerate intervals (hi <= lo) produce no bins, not a descending explosion") {
    val s = spark
    import s.implicits._
    val iv = RangeJoin.Intervals(
      Seq(("bad", 1000000.0, 0.0)).toDF("band", "lo", "hi"), "lo", "hi")
    val pts = Seq((1L, 5.0)).toDF("id", "v")
    assert(RangeJoin.binned(pts, col("v"), iv, 1.0).count() == 0)
  }

  test("binned range join plans as a hash join, not a nested loop") {
    val events = graft.Tables.load(spark, sf(), "events")
    val plan = RangeJoin.binned(events, col("value"), ivs, 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected equi-join on the bin:\n$plan")
  }

  test("boundary values land in exactly one interval") {
    val s = spark
    import s.implicits._
    val pts = Seq(0.0, 9.999, 10.0, 47.5, 299.999, 300.0, -1.0).toDF("v")
    val joined = RangeJoin.binned(pts, col("v"), ivs, 25.0)
      .select("v", "band").collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(joined == Map(0.0 -> "a", 9.999 -> "a", 10.0 -> "b", 47.5 -> "c", 299.999 -> "c"))
  }
}
