package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q77's packing invariants: windows partition each (source, shard)'s
  * documents exactly (token conservation, disjoint ordered doc spans),
  * and window starts respect the token budget arithmetic.
  */
class SequencePackSpec extends SparkSpec {

  test("windows partition each shard: tokens conserved, doc spans disjoint and ordered") {
    val out = CurationQueries.q77_sequence_pack(spark, sf())
    val B = CurationQueries.packBudget

    // token conservation per (source, shard): window sums == direct sum
    val fromWindows = out.groupBy("source", "shard")
      .agg(sum("n_tokens").as("t"), sum("n_docs").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val direct = graft.Tables.load(spark, sf(), "documents")
      .groupBy(col("source"), expr(s"doc_id div ${CurationQueries.packShardDocs}").as("shard"))
      .agg(sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")).as("t"),
        count(lit(1)).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fromWindows == direct)

    // within a shard: windows in id order carry disjoint, ordered doc spans
    out.collect().groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2)) // window_id
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(6) < b.getLong(5), "doc spans must not overlap") // a.last < b.first
        case _ =>
      }
      // budget arithmetic: a window's id is its first doc's start
      // offset div budget, and that offset is the running token sum
      // of all earlier windows in the shard (windows partition docs
      // in order) — this pins the concat-and-chunk assignment itself
      var running = 0L
      sorted.foreach { r =>
        assert(running / B == r.getLong(2),
          s"window_id ${r.getLong(2)} != first-doc start $running div $B")
        running += r.getLong(4) // n_tokens
      }
    }
    assert(out.count() > 0)
  }
}
