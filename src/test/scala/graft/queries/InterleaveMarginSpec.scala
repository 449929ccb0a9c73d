package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for q148 (weighted interleave: exact per-tick emission
  * pattern on a full-epoch fixture), q149 (sorted neighborhood
  * recovers the quintile-straddling true match q116's blocking
  * provably drops), q150 (hand-traced credit split, organic purchases
  * excluded, lookback honored), and q151 (a sequential double/BigInt
  * replica of the full margin pipeline, plus the density correction
  * actually reordering raw cosine ranks).
  */
class InterleaveMarginSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------- q148 ----------

  test("q148: weights 8/4/2/1 emit exactly w_s docs per 16-tick round while stocked") {
    import spark.implicits._
    val dir = tmp("il")
    val rows = Seq(("src0", 32), ("src1", 16), ("src2", 8), ("src3", 4))
      .flatMap { case (s, n) => (1 to n).map(i => (s.hashCode.toLong * 1000 + i, s)) }
    rows.map { case (id, s) => (id, "t", "en", s, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.q148_interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.length === 60)
    // virtual time v = (r*16) DIV w: source of weight w emits exactly w
    // docs per 16 ticks until its stock runs out (4 full rounds here)
    for (round <- 0 until 4) {
      val inRound = got.filter(g => g._4 > round * 16 && g._4 <= (round + 1) * 16)
      val bySrc = inRound.groupBy(_._2).view.mapValues(_.length).toMap
      assert(bySrc === Map("src0" -> 8, "src1" -> 4, "src2" -> 2, "src3" -> 1),
        s"round $round: $bySrc")
    }
    // positions are a permutation of 1..60 and deterministic on rerun
    assert(got.map(_._1).sorted.toSeq === (1L to 60L))
    val again = CurationQueries.q148_interleave(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === got.toSeq)
  }

  // ---------- q149 ----------

  test("q149: emits the size-quintile-straddling match; q116's shifted pass now recovers it too") {
    import spark.implicits._
    val dir = tmp("sn")
    // sizes 4 vs 6: |delta| <= 2 (agree, +20) but BASE quintiles 0 vs
    // 1 — a single-grid equi-join can never pair them; identical
    // adj/ptype and close price push the score to 40+30+20+10 = 100.
    // SN finds it through sort adjacency; q116 finds it since round
    // 16 through the 2-shifted second grid — both linkage families
    // now agree on this fixture
    val parts = Seq(
      (1L, "azure rose polished", "B1", "tin", 4, 100.00),
      (2L, "azure rose polished", "B1", "tin", 6, 102.00),
      (3L, "crimson oak rough", "B2", "zinc", 30, 500.00))
    parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val sn = MiningQueries.q149_sorted_neighborhood(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(sn.toSeq === Seq((1L, 2L, 100)))
    val blocked = MiningQueries.q116_record_linkage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(blocked.toSeq === Seq((1L, 2L, 100)),
      "the shifted-grid union must emit the straddling match")
  }

  // ---------- q150 ----------

  test("q150: equal split in micro-cents, organic purchases and stale touches excluded") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = tmp("attr")
    val ev = Seq(
      // user 1: 2 views + 1 click inside the window, purchase 3.00
      (1L, ts("2024-01-10 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-11 10:00:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-12 10:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-13 10:00:00"), 1L, "purchase", 3.0, "{}"),
      // user 1: a view 8 days before a second purchase — outside lookback
      (5L, ts("2024-01-20 10:00:00"), 1L, "purchase", 9.99, "{}"),
      // user 2: purchase with no touches at all (organic)
      (6L, ts("2024-01-13 10:00:00"), 2L, "purchase", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q150_attribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // 300 cents over k=3 touches → 100 000 000 micro-cents each
    assert(got.toSeq === Seq(
      (1L, "click", 1L, 100000000L),
      (1L, "view", 2L, 200000000L)))
  }

  // ---------- q151 ----------

  test("q151: matches a sequential replica of the scaled-margin pipeline") {
    val vecs = graft.Tables.load(spark, sf(), "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val qs = vecs.map(_._1).filter(_ < 50)
    val scored = for {
      q <- qs; (n, nv) <- vecs if n != q
    } yield (q, n,
      math.floor(dot(byId(q), nv) / (norms(q) * norms(n)) * 1e9).toLong)
    val k = VectorQueries.marginK
    val qk = scored.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(r => (r._3, r._2)).sortBy(t => (-t._1, t._2)).take(k).map(_._1).sum }
    val nk = scored.groupBy(_._2).map { case (n, rs) =>
      n -> rs.map(r => (r._3, r._1)).sortBy(t => (-t._1, t._2)).take(k).map(_._1).sum }
    val expect = scored.groupBy(_._1).iterator.flatMap { case (q, rs) =>
      rs.filter(r => qk(q) + nk(r._2) > 0)
        .map { r =>
          val m = BigInt(r._3) * 2 * k * 1000000 / BigInt(qk(q) + nk(r._2))
          (q, r._2, r._3, m.toLong)
        }
        .sortBy(t => (-t._4, t._2)).take(3).zipWithIndex
        .map { case ((qq, n, cs, m), i) => (qq, i + 1L) -> ((n, cs, m)) }
    }.toMap
    val got = VectorQueries.q151_margin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }

  test("q151: the density normalizer reorders at least one raw-cosine ranking") {
    val margin = VectorQueries.q151_margin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val cosTop = VectorQueries.q28_knn_bruteforce(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .filter(_._2 <= 3)
    val m3 = margin.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val c3 = cosTop.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(m3.keySet === c3.keySet)
    assert(m3.exists { case (q, ms) => c3(q) != ms },
      "margin ranking identical to cosine ranking everywhere — normalizer is a no-op")
  }
}
