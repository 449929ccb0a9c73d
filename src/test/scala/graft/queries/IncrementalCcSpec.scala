package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins q186's incremental merge semantics on hand eras: a batch edge
  * MERGES two existing components (min-of-mins label), a batch-only
  * pair forms a NEW component, an untouched component survives
  * unchanged — and the result equals a from-scratch recompute over
  * the union (the incremental ≡ rescan rule the oracle enforces on
  * the real corpus).
  */
class IncrementalCcSpec extends SparkSpec {

  test("q186: era-B edges merge, create, and leave alone — exactly like a rescan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("icc").toString
    val jan = Timestamp.valueOf("1995-01-15 00:00:00")
    val mar = Timestamp.valueOf("1995-03-15 00:00:00")
    // era A baskets: {1,2}, {3,4}, {7,8} → components {1,2}, {3,4}, {7,8}
    // era B baskets: {2,3} (merges the first two), {10,11} (brand new)
    val orders = Seq(
      (1L, jan), (2L, jan), (3L, jan), (4L, mar), (5L, mar))
      .map { case (ok, ts) => (ok, 1L, ts) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 7L), (3L, 8L),
      (4L, 2L), (4L, 3L), (5L, 10L), (5L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphQueries.q186_incremental_cc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 4L, 10L),   // {1,2,3,4} merged through era B's {2,3}
      (7L, 2L, 15L),   // untouched era-A component survives
      (10L, 2L, 21L))) // era-B-only vertices form their own component
  }
}
