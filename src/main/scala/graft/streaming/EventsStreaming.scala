package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2, streaming section).
  *
  * The batch twins are Analytics.q17 (tumbling window) and q18
  * (sessionization); these are the `readStream` forms. Watermarks
  * bound state: at 100 TB/day the window state is O(windows × groups),
  * not O(events), and late data beyond the watermark is dropped
  * deterministically.
  */
object EventsStreaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionUpdate(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Watermarked tumbling-window counts — identical aggregation
    * expression to the batch q17; only the source/sink differ.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Custom-state sessionization with flatMapGroupsWithState: a session
    * closes when a later event arrives past the 30-min gap, or (with
    * the default ProcessingTimeTimeout) when the group has been idle
    * past the gap. Emits one row per closed session.
    *
    * Tests pass NoTimeout: timeout-driven queries re-trigger
    * continuously, which never quiesces under processAllAvailable.
    */
  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionUpdate] = {
    import spark.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], SessionUpdate](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          val gapMs = 30 * 60 * 1000L
          val incoming = rows.toList.sortBy(_.ts.getTime)
          val all = (state.getOption.getOrElse(Nil) ++ incoming).sortBy(_.ts.getTime)
          if (state.hasTimedOut) {
            state.remove()
            emitSessions(userId, all, gapMs, flushAll = true)
          } else {
            // emit all closed sessions, keep the trailing open one
            val (closed, open) = splitSessions(all, gapMs)
            if (open.nonEmpty) {
              state.update(open)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            } else state.remove()
            closed.map(s => toUpdate(userId, s)).iterator
          }
      }
  }

  private def splitSessions(events: List[Event], gapMs: Long): (List[List[Event]], List[Event]) = {
    if (events.isEmpty) return (Nil, Nil)
    // Gap test on WHOLE-SECOND truncated epochs — identical to batch
    // q18's unix_timestamp() difference, so stream sessions are exactly
    // the batch sessions even under sub-second event timestamps.
    def esec(e: Event): Long = Math.floorDiv(e.ts.getTime, 1000L)
    val gapSec = gapMs / 1000L
    val sessions = events.tail.foldLeft(List(List(events.head))) { (acc, e) =>
      val cur = acc.head
      // gap-based sessions: break only on >gap since the previous event
      if (esec(e) - esec(cur.last) > gapSec) List(e) :: acc
      else (cur :+ e) :: acc.tail
    }.reverse
    (sessions.init, sessions.last)
  }

  private def emitSessions(userId: Long, events: List[Event], gapMs: Long,
      flushAll: Boolean): Iterator[SessionUpdate] = {
    val (closed, open) = splitSessions(events, gapMs)
    val all = if (flushAll && open.nonEmpty) closed :+ open else closed
    all.map(s => toUpdate(userId, s)).iterator
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension snapshot. Plans as a broadcast join per micro-batch —
    * the stream is never shuffled and carries no state; the dimension
    * is re-broadcast only when its underlying snapshot changes (for a
    * continuously-updated dim, the streaming consolidation snapshot is
    * exactly what this would read).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  private def toUpdate(userId: Long, s: List[Event]): SessionUpdate =
    SessionUpdate(userId, s.head.ts, s.last.ts, s.length, s.map(_.value).sum)
}
