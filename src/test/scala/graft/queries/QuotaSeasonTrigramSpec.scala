package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for q175 (exact quotas, short-source edge, determinism),
  * q176 (the ISO-weekday shift both engines must agree on, peak
  * flags), and q177 (hand-traced trigram conditionals).
  */
class QuotaSeasonTrigramSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q175: exact quota per source, short sources keep everything, reruns identical") {
    import spark.implicits._
    val dir = tmp("quota")
    val docs = (1 to 25).map(i => (i.toLong, "t", "en", "big", 1L)) ++
      (100 to 102).map(i => (i.toLong, "t", "en", "tiny", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.q175_quota_sample(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.count(_._1 == "big") === CurationQueries.quotaK)
    assert(got.count(_._1 == "tiny") === 3)
    assert(got.map(_._2).forall(_ >= 1))
    val again = CurationQueries.q175_quota_sample(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("q176: ISO weekday shift — 2024-01-01 is Monday=1, Sunday=7; peaks flagged per dow") {
    import spark.implicits._
    val dir = tmp("season")
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 02:00:00"), 1L, "view", 0.0, "{}"), // Mon 02
      (2L, ts("2024-01-01 02:30:00"), 1L, "view", 0.0, "{}"), // Mon 02
      (3L, ts("2024-01-01 03:00:00"), 1L, "purchase", 2.0, "{}"), // Mon 03
      (4L, ts("2024-01-07 10:00:00"), 1L, "view", 0.0, "{}")) // Sun 10
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q176_seasonality(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1, 2, 2L, 0L, true),
      (1, 3, 1L, 200L, false),
      (7, 10, 1L, 0L, true)))
  }

  test("q177: hand-traced trigram conditionals split AB's successors 50/50") {
    import spark.implicits._
    val dir = tmp("tri")
    def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val seq1 = Seq("A", "B", "C", "A", "B", "D")
    val ev = seq1.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, ts(i), 1L, t, 0.0, "{}") }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q177_event_trigrams(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("A", "B", "C") -> ((1L, 500000L)),
      ("A", "B", "D") -> ((1L, 500000L)),
      ("B", "C", "A") -> ((1L, 1000000L)),
      ("C", "A", "B") -> ((1L, 1000000L))))
  }
}
