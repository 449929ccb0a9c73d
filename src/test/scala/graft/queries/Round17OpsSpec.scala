package graft.queries

import graft.SparkSpec

/** Round-17 pins: streamed index ingest for the two VECTOR families
  * must be a pure transport change — the drained stream's merged
  * artifact searches exactly like the batch append leg it lowers
  * (both run the same frozen models over the same b73| split, so the
  * equality is deterministic, not approximate).
  */
class Round17OpsSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("q320: streamed IVF ingest equals the batch append leg row for row") {
    val dir = sf("sf0.001")
    assert(sameRows(VectorQueries.q320_stream_ivf_ingest(spark, dir),
      VectorQueries.q227_ivf_index_update(spark, dir)),
      "stream-ingested inverted file diverged from the batch append")
  }

  test("q321: streamed PQ ingest equals the batch append leg row for row") {
    val dir = sf("sf0.001")
    assert(sameRows(VectorQueries.q321_stream_pq_ingest(spark, dir),
      VectorQueries.q296_pq_index_update(spark, dir)),
      "stream-encoded code table diverged from the batch append")
  }
}
