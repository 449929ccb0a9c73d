package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for q152 (the outer join must surface the zero-order bucket),
  * q153 (time-RANGE frame boundaries and tie-peer inclusion), and
  * q154 (eval identities: verified-LSH ⊆ exact, count algebra,
  * perfect recall on an identical-doc fixture).
  */
class OuterDistRangeSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q152: customers with zero orders form their own bucket (outer-join survival)") {
    import spark.implicits._
    val dir = tmp("q13")
    Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // cust 1 → 2 orders, cust 2 → 1, custs 3 and 4 → none
    Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.q152_order_distribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("q153: frame holds exactly the trailing 1800s; same-second peers always co-frame") {
    import spark.implicits._
    val dir = tmp("rng")
    def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000) // 2024-01-01 UTC
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(600), 1L, "view", 2.0, "{}"),
      (3L, ts(2000), 1L, "view", 4.0, "{}"),   // 2000-600=1400 in, 2000-0=2000 out
      (4L, ts(5000), 1L, "view", 8.0, "{}"),   // alone
      (5L, ts(7000), 2L, "view", 16.0, "{}"),  // tie peers, user 2
      (6L, ts(7000), 2L, "view", 32.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DistributionQueries.q153_range_frame(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 100L)),
      2L -> ((2L, 300L)),
      3L -> ((2L, 600L)),
      4L -> ((1L, 800L)),
      // RANGE peers: both same-second events see both, regardless of order
      5L -> ((2L, 4800L)),
      6L -> ((2L, 4800L))))
  }

  test("q154: count algebra holds and verified-LSH never exceeds exact truth") {
    val r = TextQueries.q154_dedup_eval(spark, sf()).collect().head
    val (nE, nL, nC, nM, nX) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nC === nE - nM)
    assert(nC === nL - nX)
    assert(nX === 0L, "LSH emitted a pair the exact join lacks — thresholds diverged")
    assert(r.getLong(6) === nC * 1000000L / nE)
  }

  test("q154: identical documents are found by both sides — recall exactly 10^6") {
    import spark.implicits._
    val dir = tmp("ev")
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different words populate this unrelated document body here"
    Seq((1L, text), (2L, text), (3L, other))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.q154_dedup_eval(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(6))
      === (1L, 0L, 0L, 1000000L))
  }
}
