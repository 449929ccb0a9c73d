package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for q155 (P/R/F1 algebra on a hand-labeled confusion case),
  * q156 (per-dimension moments vs a sequential BigInt replica;
  * constant and collapsed dimensions), q157 (hand-traced deltas incl.
  * the NULL first week and a negative delta), and q158 (keyness puts
  * a source's planted token first; shared vocabulary lifts ≈ 1).
  */
class ProfileEvalSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------- q155 ----------

  test("q155: hand-labeled corpus — tp/fp/fn and exact ppm P/R/F1") {
    import spark.implicits._
    val dir = tmp("lid")
    val en = "the cat and the dog in the house is it you that"   // detects en
    val de = "der hund und die katze ist nicht mit ein zu der"   // detects de
    // declared en but German text → detected de: fn for en, fp for de
    val docs = Seq((1L, en, "en"), (2L, en, "en"), (3L, de, "de"), (4L, de, "en"))
    docs.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.q155_langid_eval(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // en: tp=2, fp=0, fn=1 → P=10^6, R=666666, F1=2PR/(P+R)
    val f1en = 2L * 1000000L * 666666L / (1000000L + 666666L)
    assert(got("en") === ((2L, 0L, 1L, 1000000L, 666666L, f1en)))
    // de: tp=1, fp=1, fn=0 → P=500000, R=10^6
    val f1de = 2L * 500000L * 1000000L / (500000L + 1000000L)
    assert(got("de") === ((1L, 1L, 0L, 500000L, 1000000L, f1de)))
  }

  // ---------- q156 ----------

  test("q156: matches a sequential BigInt moment replica; flags a constant dimension") {
    import spark.implicits._
    val dir = tmp("emb")
    val rows = Seq(
      (1L, Array(1.0f, 0.5f, -0.25f)),
      (2L, Array(1.0f, 1.5f, 0.75f)),
      (3L, Array(1.0f, -2.0f, 0.5f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.q156_embedding_profile(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val expect = (0 until 3).map { d =>
      val cms = rows.map(r => BigInt(math.floor(r._2(d).toDouble * 1e6).toLong))
      val n = BigInt(cms.length); val s = cms.sum
      val q = cms.map(c => c * c).sum
      d -> ((n.toLong, (s / n).toLong, ((n * q - s * s) / (n * n)).toLong,
        cms.min.toLong, cms.max.toLong))
    }.toMap
    assert(got === expect)
    // dimension 0 is constant: variance exactly 0 — the collapsed-dim alarm
    assert(got(0)._3 === 0L && got(0)._4 === got(0)._5)
  }

  test("q156: replica-exact on the real embeddings table") {
    val vecs = graft.Tables.load(spark, sf(), "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val expect = (0 until dims).map { d =>
      val cms = vecs.map(v => BigInt(math.floor(v(d).toDouble * 1e6).toLong))
      val n = BigInt(cms.length); val s = cms.sum; val q = cms.map(c => c * c).sum
      d -> ((s / n).toLong, ((n * q - s * s) / (n * n)).toLong)
    }.toMap
    val got = VectorQueries.q156_embedding_profile(spark, sf()).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }

  // ---------- q157 ----------

  test("q157: NULL first week, exact ppm deltas incl. a negative one") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = tmp("wow")
    // Mondays: 2024-01-01, 2024-01-08 — week 1: 4 clicks of 1.00;
    // week 2: 1 click of 3.00 → n: 4→1 (-750000 ppm), cents: 400→300 (-250000)
    val ev = (1 to 4).map(i =>
      (i.toLong, ts(s"2024-01-0$i 10:00:00"), 1L, "click", 1.0, "{}")) :+
      ((5L, ts("2024-01-08 10:00:00"), 1L, "click", 3.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q157_wow_change(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      ("2024-01-01", 4L, 400L, None, None),
      ("2024-01-08", 1L, 300L, Some(-750000L), Some(-250000L))))
  }

  // ---------- q158 ----------

  test("q158: a source's planted token tops its keyness list; shared vocab lifts ~1") {
    import spark.implicits._
    val dir = tmp("key")
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared zyzzyva zyzzyva zyzzyva zyzzyva zyzzyva", "s0"),
      (2L, s"$shared $shared", "s1"),
      (3L, s"$shared $shared", "s1"),
      (4L, s"$shared $shared", "s1"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.q158_source_keyness(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(5)))
    val s0 = got.filter(_._1 == "s0")
    // zyzzyva: only in s0 → lift = c·N_tot/(c_w·N_s0) = 5·40/(5·10) = 4.0
    assert(s0.head._3 === "zyzzyva" && s0.head._4 === 4000000L)
    // s0's shared tokens appear once (< floor 5) → zyzzyva is s0's ONLY row
    assert(s0.length === 1)
    // every shared token in s1: lift = 6·40/(7·30) → 1_142_857
    val s1lifts = got.filter(_._1 == "s1").map(_._4).distinct
    assert(s1lifts === Array(1142857L))
  }
}
