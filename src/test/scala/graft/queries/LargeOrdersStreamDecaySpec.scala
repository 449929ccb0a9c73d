package graft.queries

import graft.SparkSpec

/** Pins q160's plan shape (the qualifying-order set broadcasts into
  * the rejoin — the big tables never shuffle for assembly) and q161's
  * incremental ≡ rescan equality against the batch operator directly
  * (the oracle gate proves it vs DuckDB; this proves it vs q135's own
  * Spark output, row for row).
  */
class LargeOrdersStreamDecaySpec extends SparkSpec {

  test("q160: the HAVING survivors ride a broadcast join into the rejoin") {
    val plan = Analytics.q160_large_orders(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"no broadcast in q160's plan:\n$plan")
  }

  test("q160: every emitted order genuinely exceeds the quantity threshold") {
    val rows = Analytics.q160_large_orders(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(5) > Analytics.largeOrderQty))
  }

  test("q161: streaming incremental state equals q135's one-shot batch aggregate") {
    val stream = StreamingParity.q161_stream_decay(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = EventQueries.q135_decay_score(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stream.toSeq === batch.toSeq)
    assert(stream.nonEmpty)
  }
}
