package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-traced pins for the round-11 corpus-statistics family
  * (q196–q201) on planted data, plus internal-consistency checks for
  * q200 against q47 on the shared sf0.001 cluster graph.
  */
class RichnessSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, src, text, text.length.toLong, "en") }
      .toDF("doc_id", "source", "text", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEvents(dir: String, rows: Seq[(Long, String, Long, Double)]): Unit = {
    import spark.implicits._
    def ts = Timestamp.valueOf("2024-01-10 10:00:00")
    rows.map { case (id, et, uid, v) => (id, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q196: hapax arithmetic on a planted vocabulary") {
    val dir = tmp("hapax")
    // source a: tokens x x y → 3 tokens, 2 types, 1 hapax
    writeDocs(dir, Seq((1L, "a", "x x"), (2L, "a", "y")))
    val r = RichnessQueries.q196_hapax(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((3L, 2L, 1L, 500000L, 666666L)))
  }

  test("q197: nearest-rank tail percentiles and guarded ratios") {
    val dir = tmp("tail")
    writeEvents(dir, (1 to 10).map(i => (i.toLong, "click", 1L, i / 100.0)))
    val r = RichnessQueries.q197_tail_ratio(spark, dir).collect().head
    // cents 1..10: p50 = rank 5 → 5, p90 = rank 9 → 9, p99/p999 = rank 10 → 10
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((10L, 5L, 9L, 10L, 10L)))
    assert((r.getLong(6), r.getLong(7), r.getLong(8))
      === ((1800000L, 1111111L, 1000000L)))
  }

  test("q198: Gini–Simpson ppm on a planted distribution") {
    val dir = tmp("simp")
    writeDocs(dir, Seq((1L, "a", "x x"), (2L, "a", "y")))
    val r = RichnessQueries.q198_simpson_diversity(spark, dir).collect().head
    // T=3, Σc²=5 → (9−5)·10⁶ DIV 9 = 444444
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 2L, 444444L)))
  }

  test("q199: Fano factor on a planted burst") {
    val dir = tmp("fano")
    writeEvents(dir, Seq((1L, "click", 1L, 0.0), (2L, "click", 2L, 0.0),
      (3L, "click", 2L, 0.0), (4L, "click", 2L, 0.0)))
    val r = RichnessQueries.q199_fano(spark, dir).collect().head
    // x = (1, 3): N=2, Σx=4, Σx²=10 → (20−16)·10⁶ DIV 8 = 500000
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 4L, 500000L)))
  }

  test("q200: size distribution is exactly q47's clusters plus the singleton complement") {
    val dist = RichnessQueries.q200_cluster_sizes(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val q47 = GraphQueries.q47_dup_clusters(spark, sf()).collect()
    val bySize = q47.groupBy(_.getLong(2)).map { case (s, rows) =>
      s -> ((rows.map(_.getLong(1)).distinct.size.toLong, rows.size.toLong))
    }
    bySize.foreach { case (s, want) =>
      assert(dist(s) === want, s"cluster size $s") }
    val total = graft.Tables.load(spark, sf(), "documents").count()
    assert(dist(1L)._2 === total - q47.length, "singleton complement")
    assert(dist.values.map(_._2).sum === total, "every doc accounted for")
  }

  test("q207: fertility counts subwords per word exactly") {
    val dir = tmp("fert")
    // "ab1cd e-f": words = [ab1cd, e-f] (2); bpe = ab,1,cd,e,-,f (6)
    writeDocs(dir, Seq((1L, "a", "ab1cd e-f")))
    val r = RichnessQueries.q207_fertility(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((1L, 2L, 6L, 3000000L, 3000000L)))
  }

  test("q208: repetition ratio on planted boilerplate vs organic text") {
    val dir = tmp("comp")
    // doc 1: "a b c d a b c d a b c d" → 9 4-grams, 4 distinct → 444444
    // doc 2: "p q r s t" → 2 4-grams, both distinct → 1000000
    // doc 3: "x y z" → no 4-grams, excluded
    writeDocs(dir, Seq(
      (1L, "a", "a b c d a b c d a b c d"),
      (2L, "a", "p q r s t"),
      (3L, "a", "x y z")))
    val r = RichnessQueries.q208_compressibility(spark, dir).collect().head
    // mean = (444444 + 1000000) DIV 2 = 722222; one doc under ½
    assert((r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 722222L, 1L)))
  }

  test("q210: r matches an exact-moment BigInt replica on real data") {
    import org.apache.spark.sql.functions._
    val pts = graft.Tables.load(spark, sf(), "documents")
      .select(col("source"), col("n_chars").cast("long"),
        floor(graft.functions.TextFunctions.qualityScore(col("text")) * 1000000L)
          .cast("long"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val want = pts.groupBy(_._1).map { case (src, ps) =>
      val n = BigInt(ps.length)
      val (sx, sy) = (ps.map(_._2).sum, ps.map(_._3).sum)
      val sxx = ps.map(p => p._2 * p._2).sum
      val syy = ps.map(p => p._3 * p._3).sum
      val sxy = ps.map(p => p._2 * p._3).sum
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble) /
        math.sqrt((n * syy - sy * sy).toDouble)
      src -> r
    }
    val got = RichnessQueries.q210_length_quality_corr(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    want.foreach { case (src, r) =>
      assert(math.abs(got(src) - r) < 1e-12, s"$src: ${got(src)} vs $r")
      assert(got(src) >= -1.0 && got(src) <= 1.0)
    }
  }

  test("q211: gap percentiles on a planted cadence") {
    val dir = tmp("gap")
    import spark.implicits._
    def ts(s: Int) = Timestamp.valueOf(java.time.LocalDateTime
      .ofEpochSecond(1704880000L + s, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
    // user 1 clicks at t+0, t+10, t+30 → gaps 10, 20
    Seq((1L, ts(0), 1L, "click", 0.0, "{}"), (2L, ts(10), 1L, "click", 0.0, "{}"),
      (3L, ts(30), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = RichnessQueries.q211_interarrival(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 10L, 20L)))
  }

  test("q201: uniformity underestimate on a planted skewed key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmp("card")
    // day1: 3 orders, day2: 1 → n=4, ndv=2, Σc²=10 →
    // underest = (10·2 − 16)·10⁶ DIV 16 = 250000; peak = 3
    Seq((1L, "1995-01-01"), (2L, "1995-01-01"), (3L, "1995-01-01"),
      (4L, "1995-01-02"))
      .toDF("o_orderkey", "d")
      .select(col("o_orderkey"), lit(1L).as("o_custkey"),
        to_timestamp(col("d")).as("o_orderdate"),
        lit("O").as("o_orderstatus"), lit(1.0).as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = RichnessQueries.q201_join_card_estimate(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 2L, 3L, 250000L)))
  }
}
