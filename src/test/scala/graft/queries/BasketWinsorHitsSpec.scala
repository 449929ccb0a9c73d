package graft.queries

import graft.SparkSpec

/** Pins for q144 (association rules: hand-traced support/confidence/
  * lift), q145/q146 (winsorize + equi-depth: clipping semantics on a
  * hand fixture, full sequential replica on real data), and q147
  * (HITS: sequential BigInt replica of the normalized recursion, and
  * the hub/authority asymmetry a degree count can't express).
  */
class BasketWinsorHitsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------- q144 ----------

  test("q144: hand-traced rule — support, both confidences, lift; floor drops singletons") {
    import spark.implicits._
    val dir = tmp("basket")
    // baskets: {10,20,30}, {10,20}, {10,20}, {30}
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 10L), (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = MiningQueries.q144_basket(spark, dir).collect()
    assert(got.length === 1) // (10,20) co-occurs 3x; the others once
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === (10L, 20L, 3L, 3L, 3L, 4L))
    assert(r.getLong(6) === 750000L)        // support 3/4
    assert(r.getLong(7) === 1000000L)       // conf 10→20 = 3/3
    assert(r.getLong(8) === 1000000L)       // conf 20→10
    assert(r.getLong(9) === 1333333L)       // lift 3·4/(3·3) = 4/3
  }

  // ---------- q145 / q146 ----------

  private def centsByType(dir: String): Map[String, Seq[Long]] = {
    graft.Tables.load(spark, dir, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.sortBy(r => (r._3, r._2)).map(_._3).toSeq }
  }

  test("q145: matches a sequential order-statistics replica on the real events") {
    val expect = centsByType(sf()).map { case (t, sorted) =>
      val n = sorted.length
      val lo = sorted((n + 19) / 20 - 1)
      val hi = sorted((19 * n + 19) / 20 - 1)
      t -> ((n.toLong, lo, hi,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
        sorted.sum, sorted.map(c => math.min(math.max(c, lo), hi)).sum))
    }
    val got = DistributionQueries.q145_winsorize(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got === expect)
    // the clip must actually bite on a fat-tailed stream
    assert(got.values.exists(v => v._4 > 0 && v._5 > 0))
  }

  test("q146: buckets are equi-depth to ±1 and cover the full range, replica-exact") {
    val k = DistributionQueries.equiDepthBuckets
    val expect = centsByType(sf()).flatMap { case (t, sorted) =>
      val n = sorted.length
      sorted.zipWithIndex.groupBy { case (_, i) => i.toLong * k / n }
        .map { case (b, rows) =>
          (t, b.toInt) -> ((rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max)) }
    }
    val got = DistributionQueries.q146_equidepth(spark, sf()).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
    got.groupBy(_._1._1).foreach { case (_, buckets) =>
      val counts = buckets.values.map(_._1)
      assert(buckets.size === k)
      assert(counts.max - counts.min <= 1, s"not equi-depth: $counts")
    }
  }

  test("q146: a group smaller than k emits no empty buckets (window parity)") {
    import spark.implicits._
    // 3 rows, k = 8: ranks land in buckets 0, 2, 5 only — the window
    // form emits exactly three rows, never an n_rows = 0 filler
    val tiny = Seq(("t", 10L), ("t", 20L), ("t", 30L))
      .toDF("event_type", "cents")
    val got = DistributionQueries.equidepthOf(tiny, 8).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.forall(_._2._1 > 0), s"empty buckets emitted: ${got.mkString(",")}")
    val expect = Seq(0 -> ((1L, 10L, 10L)), 2 -> ((1L, 20L, 20L)),
      5 -> ((1L, 30L, 30L)))
    assert(got.toSeq === expect)
  }

  // ---------- q147 ----------

  /** Sequential replica of hitsLoop's integer recursion. */
  private def hitsReplica(edges: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, BigInt], Map[Long, BigInt]) = {
    val scale = BigInt("1000000000000")
    var hub: Map[Long, BigInt] =
      edges.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
    var auth: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to rounds) {
      val ar = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => hub(e._1)).sum }
      val asum = ar.values.sum
      auth = ar.map { case (s, v) => s -> v * scale / asum }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum }
      val hsum = hr.values.sum
      hub = hr.map { case (c, v) => c -> v * scale / hsum }
    }
    (hub, auth)
  }

  test("q147: hitsLoop matches the BigInt replica on an asymmetric hand graph") {
    import spark.implicits._
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 101L), (3L, 103L))
    val (eh, ea) = hitsReplica(edges, GraphQueries.hitsRounds)
    val got = GraphQueries.hitsLoop(
      edges.toDF("c", "s"), GraphQueries.hitsRounds).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect =
      eh.map { case (c, v) => ("customer", c) -> v.toLong } ++
        ea.map { case (s, v) => ("supplier", s) -> v.toLong }
    assert(got === expect)
    // 101 is ordered by every hub → strictly dominant authority;
    // hub 1 and hub 3 both touch 101 + one niche supplier but 3's
    // niche (103) is weaker than... both niches are symmetric, so
    // hubs 1 and 3 tie and both beat single-edge hub 2
    assert(ea(101L) > ea(102L) && ea(102L) === ea(103L))
    assert(eh(1L) === eh(3L) && eh(1L) > eh(2L))
  }

  test("q147: scores renormalize to the 10^12 simplex each half-round") {
    import spark.implicits._
    val edges = Seq((1L, 101L), (2L, 102L), (2L, 101L))
    val got = GraphQueries.hitsLoop(edges.toDF("c", "s"), 2).collect()
    val byType = got.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      // integer DIV truncation loses at most (nodes-1) units
      assert(tot <= 1000000000000L && tot > 1000000000000L - rows.length)
    }
  }
}
