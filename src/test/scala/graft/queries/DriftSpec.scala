package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for the distribution-monitoring operators: q141's exact
  * two-sample KS statistic (hand-traced CDF walk, zero-drift identity,
  * sequential BigInt replica over real data), q142's triangular-
  * discrimination histogram drift (hand-computed ppm contributions,
  * identical-histogram zero), and q140's Gini coefficient (closed-form
  * extremes + replica).
  */
class DriftSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeEvents(dir: String,
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // one event per (period, cents) spec row; ts on either side of ksSplit
  private val tA = ts("2024-01-10 00:00:00")
  private val tB = ts("2024-01-20 00:00:00")

  // ---------- q141 ----------

  test("q141: hand-traced KS walk — D attained at the first value, min-cents tiebreak") {
    // A = {1.00, 2.00}, B = {2.00, 3.00}:
    //   cents 100: cum (1,0) → |1·2 − 0·2| = 2
    //   cents 200: cum (2,1) → |4 − 2|   = 2   (tie — argmax must take 100)
    //   cents 300: cum (2,2) → 0
    // D = 2/(2·2) = 0.5 → 500000 ppm at cents 100
    val dir = tmp("ks")
    writeEvents(dir, Seq(
      (1L, tA, 1L, "click", 1.0, "{}"),
      (2L, tA, 1L, "click", 2.0, "{}"),
      (3L, tB, 1L, "click", 2.0, "{}"),
      (4L, tB, 1L, "click", 3.0, "{}")))
    val got = DistributionQueries.q141_ks_drift(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ("click", 2L, 2L, 500000L, 100L))
  }

  test("q141: identical period distributions → zero drift") {
    val dir = tmp("ks0")
    writeEvents(dir, Seq(
      (1L, tA, 1L, "view", 1.0, "{}"),
      (2L, tA, 1L, "view", 5.0, "{}"),
      (3L, tB, 1L, "view", 1.0, "{}"),
      (4L, tB, 1L, "view", 5.0, "{}")))
    val got = DistributionQueries.q141_ks_drift(spark, dir).collect()
    assert(got.length === 1)
    assert(got.head.getLong(3) === 0L)
    // every value attains d = 0; the min-cents rule pins the first
    assert(got.head.getLong(4) === 100L)
  }

  test("q141: matches a sequential BigInt replica on the real events table") {
    val events = graft.Tables.load(spark, sf(), "events")
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val split = ts(DistributionQueries.ksSplit)
    val expect = events.groupBy(_._1).map { case (tpe, rows) =>
      val cents = rows.map { case (_, t, v) =>
        (math.round(v * 100), t.before(split)) }
      val na = BigInt(cents.count(_._2)); val nb = BigInt(cents.count(!_._2))
      val byVal = cents.groupBy(_._1).toSeq.sortBy(_._1)
      var (cuma, cumb) = (BigInt(0), BigInt(0))
      var dmax = BigInt(-1); var at = 0L
      for ((c, g) <- byVal) {
        cuma += g.count(_._2); cumb += g.count(!_._2)
        val d = (cuma * nb - cumb * na).abs
        if (d > dmax) { dmax = d; at = c }
      }
      tpe -> ((na.toLong, nb.toLong, (dmax * 1000000 / (na * nb)).toLong, at))
    }
    val got = DistributionQueries.q141_ks_drift(spark, sf()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
    // a real monitor must see SOME difference between halves of a
    // random stream, but far below a regime change
    assert(got.values.forall(v => v._3 > 0 && v._3 < 500000))
  }

  // ---------- q142 ----------

  test("q142: hand-computed triangular-discrimination contributions and flags") {
    // bins (width 50): A = {10,10,10,60} → ca = (3,1); B = {10,60,60,60} → cb = (1,3)
    // pa = (750000, 250000), pb = (250000, 750000); per bin:
    // (500000²·10⁶) DIV 10⁶ = 250_000_000_000 — both flagged, total 5e11
    val dir = tmp("hd")
    writeEvents(dir, Seq(
      (1L, tA, 1L, "click", 10.0, "{}"),
      (2L, tA, 1L, "click", 10.0, "{}"),
      (3L, tA, 1L, "click", 10.0, "{}"),
      (4L, tA, 1L, "click", 60.0, "{}"),
      (5L, tB, 1L, "click", 10.0, "{}"),
      (6L, tB, 1L, "click", 60.0, "{}"),
      (7L, tB, 1L, "click", 60.0, "{}"),
      (8L, tB, 1L, "click", 60.0, "{}")))
    val got = DistributionQueries.q142_hist_drift(spark, dir).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(got.toSeq === Seq(
      (0, 3L, 1L, 750000L, 250000L, 250000000000L, 500000000000L, true),
      (1, 1L, 3L, 250000L, 750000L, 250000000000L, 500000000000L, true)))
  }

  test("q142: identical histograms → zero contribution, nothing flagged") {
    val dir = tmp("hd0")
    writeEvents(dir, Seq(
      (1L, tA, 1L, "view", 10.0, "{}"),
      (2L, tA, 1L, "view", 60.0, "{}"),
      (3L, tB, 1L, "view", 10.0, "{}"),
      (4L, tB, 1L, "view", 60.0, "{}")))
    val got = DistributionQueries.q142_hist_drift(spark, dir).collect()
    assert(got.length === 2)
    assert(got.forall(r => r.getLong(6) === 0L && r.getLong(7) === 0L
      && !r.getBoolean(8)))
  }

  // ---------- q140 ----------

  private def writeDocs(dir: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.map { case (id, src, n) => (id, "x", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q140: uniform sizes → Gini exactly 0; concentration → hand value") {
    val dir = tmp("gini")
    writeDocs(dir, Seq(
      (1L, "flat", 50L), (2L, "flat", 50L), (3L, "flat", 50L),
      // (1,1,1,97): G = (2·(1+2+3+4·97) − 5·100) / (4·100) = 288/400
      (4L, "conc", 1L), (5L, "conc", 1L), (6L, "conc", 1L), (7L, "conc", 97L)))
    val got = DistributionQueries.q140_gini(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "conc" -> ((4L, 100L, 720000L)),
      "flat" -> ((3L, 150L, 0L))))
  }

  test("q140: matches a sequential replica per source on the real corpus") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("source", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (src, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(r => BigInt(r._2))
      val n = BigInt(xs.length); val sx = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      src -> ((n.toLong, sx.toLong,
        ((s1 * 2 - (n + 1) * sx) * 1000000 / (n * sx)).toLong))
    }
    val got = DistributionQueries.q140_gini(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }
}
