package graft.queries

import graft.SparkSpec

/** q74/q75 batch-equivalence: the REAL streaming operators (watermarked
  * tumbling agg; flatMapGroupsWithState sessionize), fed file-per-batch,
  * must emit exactly the batch twins' rows. The driver gates these with
  * DuckDB at sf0.01; here we pin them against the in-Spark batch twins
  * at sf0.001 so `sbt test` catches drift without the oracle.
  */
class StreamingParitySpec extends SparkSpec {

  test("q74 streaming tumbling counts == batch q17") {
    val streamed = StreamingParity.q74_stream_tumbling(spark, sf()).collect().toSet
    val batch = Analytics.q17_events_tumbling(spark, sf()).collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q75 streaming sessionize == batch q18 boundaries") {
    val streamed = StreamingParity.q75_stream_sessionize(spark, sf()).collect().toSet
    // q18 minus session_value (stream sums doubles in event order; boundary
    // and count parity is the sessionization semantics — see q75 scaladoc).
    val batch = Analytics.q18_sessionize(spark, sf())
      .select("user_id", "session_id", "n_events", "session_start", "session_end")
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
