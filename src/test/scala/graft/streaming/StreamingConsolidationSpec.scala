package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingConsolidationSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, v: Double) =
    EventsStreaming.Event(id, Timestamp.valueOf(t), user, "click", v)

  test("micro-batches consolidate to keep-newest per key across the whole stream") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("consol").toString
    val snapshot = s"$dir/snapshot"

    val stream = MemoryStream[EventsStreaming.Event]
    def runAvailable(): Unit = {
      val q = StreamingConsolidation.sink(
        stream.toDF(), snapshot,
        keyCol = "user_id", orderByCol = "ts", tieBreakerCol = "event_id").start()
      try q.processAllAvailable() finally q.stop()
    }

    // batch 1: users 1 and 2
    stream.addData(
      ev(1, "2024-01-01 10:00:00", 1, 10.0),
      ev(2, "2024-01-01 11:00:00", 1, 20.0), // newer for user 1
      ev(3, "2024-01-01 10:30:00", 2, 30.0))
    runAvailable()

    // batch 2: newer row for user 2, OLDER row for user 1 (must lose),
    // and a new user 3
    stream.addData(
      ev(4, "2024-01-01 09:00:00", 1, 99.0), // older than event 2
      ev(5, "2024-01-01 12:00:00", 2, 50.0),
      ev(6, "2024-01-01 10:00:00", 3, 60.0))
    runAvailable()

    val out = spark.read.parquet(snapshot)
      .select("user_id", "event_id", "value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> (2L, 20.0), // batch-2 older row lost
      2L -> (5L, 50.0), // batch-2 newer row won
      3L -> (6L, 60.0)))
  }

  test("a crash between move-aside and promote does not lose the snapshot") {
    val s = spark
    import s.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("consolcrash").toString
    val snapshot = s"$dir/snapshot"

    val stream = MemoryStream[EventsStreaming.Event]
    def runAvailable(): Unit = {
      val q = StreamingConsolidation.sink(
        stream.toDF(), snapshot,
        keyCol = "user_id", orderByCol = "ts", tieBreakerCol = "event_id").start()
      try q.processAllAvailable() finally q.stop()
    }

    stream.addData(ev(1, "2024-01-01 10:00:00", 1, 10.0))
    runAvailable()

    // simulate the crash window: the previous snapshot was moved aside
    // but the promote never happened
    val fs = new org.apache.hadoop.fs.Path(snapshot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(snapshot),
      new org.apache.hadoop.fs.Path(snapshot + "_old")))

    // the replayed/next micro-batch must first recover user 1's state
    stream.addData(ev(2, "2024-01-01 11:00:00", 2, 20.0))
    runAvailable()

    val users = spark.read.parquet(snapshot)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(users == Set(1L, 2L)) // user 1 survived the crash window
  }
}
