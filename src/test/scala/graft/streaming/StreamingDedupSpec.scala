package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: dropDuplicatesWithinWatermark — the
  * streaming twin of the batch exact-dedup operator (q23). State is
  * bounded by the watermark instead of growing with the stream.
  */
class StreamingDedupSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long) =
    EventsStreaming.Event(id, Timestamp.valueOf(t), user, "click", 1.0)

  test("duplicate event ids within the watermark are dropped") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext

    val stream = MemoryStream[EventsStreaming.Event]
    stream.addData(
      ev(1, "2024-01-01 10:00:00", 1),
      ev(1, "2024-01-01 10:00:30", 1), // redelivery of id 1
      ev(2, "2024-01-01 10:01:00", 2),
      ev(2, "2024-01-01 10:01:05", 2), // redelivery of id 2
      ev(3, "2024-01-01 10:02:00", 1))

    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()

    val ids = spark.table("dedup_stream")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
