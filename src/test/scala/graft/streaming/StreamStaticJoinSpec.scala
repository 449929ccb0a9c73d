package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamStaticJoinSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long) =
    EventsStreaming.Event(id, Timestamp.valueOf(t), user, "click", 1.0)

  test("stream-static enrichment joins each micro-batch against the dimension") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[EventsStreaming.Event]
    stream.addData(
      ev(1, "2024-01-01 10:00:00", 1),
      ev(2, "2024-01-01 10:01:00", 2),
      ev(3, "2024-01-01 10:02:00", 9)) // no dim row -> tier NULL

    val q = EventsStreaming.enrich(stream.toDF(), dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("enriched")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }
}
