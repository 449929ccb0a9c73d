package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventsStreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, tpe: String, v: Double) =
    EventsStreaming.Event(id, ts(t), user, tpe, v)

  test("streaming tumbling-window agg matches the batch twin on the same data") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext

    val data = Seq(
      ev(1, "2024-01-01 10:05:00", 1, "click", 10.0),
      ev(2, "2024-01-01 10:45:00", 1, "click", 5.0),
      ev(3, "2024-01-01 11:10:00", 2, "view", 2.0),
      ev(4, "2024-01-01 11:20:00", 1, "click", 1.0))

    val stream = MemoryStream[EventsStreaming.Event]
    stream.addData(data: _*)
    val q = EventsStreaming.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("tumbling")
      .select(date_format(col("hour_start"), "HH:mm").as("h"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventsStreaming.tumblingCounts(data.toDF())
      .select(date_format(col("hour_start"), "HH:mm").as("h"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed == Set(("10:00", "click", 2L), ("11:00", "view", 1L), ("11:00", "click", 1L)))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext

    val stream = MemoryStream[EventsStreaming.Event]
    // user 1: two sessions separated by a 2h gap; second still open
    stream.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
      ev(3, "2024-01-01 12:30:00", 1, "click", 4.0))

    val q = EventsStreaming.sessionize(spark, stream.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally { q.stop() }

    val closed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getDouble(4)))
    // only the first session is closed (the 12:30 one is open in state)
    assert(closed.toSeq == Seq((1L, 2, 3.0)))
  }

  test("sessionization splitting matches batch q18 on real data at tiny scale") {
    val s = spark
    import s.implicits._
    // batch q18 result for comparison
    val batch = graft.queries.Analytics.q18_sessionize(spark, sf())
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // drive the same events through the streaming session splitter logic
    val events = graft.Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventsStreaming.Event].collect().toList.groupBy(_.user_id)
    val viaSplitter = events.map { case (u, es) =>
      u -> countSessions(es.sortBy(_.ts.getTime))
    }
    assert(viaSplitter == batch.view.mapValues(_.toInt).toMap)
  }

  private def countSessions(events: List[EventsStreaming.Event]): Int = {
    if (events.isEmpty) return 0
    1 + events.sliding(2).count {
      case List(a, b) => b.ts.getTime - a.ts.getTime > 30 * 60 * 1000L
      case _          => false
    }
  }
}
