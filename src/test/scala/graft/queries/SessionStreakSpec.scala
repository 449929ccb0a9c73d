package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins q189's native session_window against q18's hand-rolled
  * lag/running-sum sessionizer (two mechanisms, one truth, row for
  * row), and q190's island arithmetic on a hand timeline.
  */
class SessionStreakSpec extends SparkSpec {

  test("q189: native session_window ≡ q18's lag/running-sum sessions, row for row") {
    val native = Analytics.q189_session_window(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    val hand = Analytics.q18_sessionize(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(native.toSeq === hand.toSeq)
    assert(native.nonEmpty)
  }

  test("q190: hand timeline — 3-day streak beats later 2-day run; active days total") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("streak").toString
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(1, 2, 3, 5, 10, 11).zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, ts(d), 1L, "view", 0.0, "{}") } ++
      // a second event on an already-active day must not inflate anything
      Seq((99L, Timestamp.valueOf("2024-01-02 23:00:00"), 1L, "click", 0.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.q190_streaks(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      === (1L, 3L, "2024-01-01", 6L))
  }
}
