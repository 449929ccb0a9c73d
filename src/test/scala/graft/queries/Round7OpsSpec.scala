package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape pins for the round-7 additions — the properties a
  * 100 TB run depends on, asserted on the actual executed plans.
  */
class Round7OpsSpec extends SparkSpec {

  test("q95: the corpus scan reads only doc_id and text (column pruning)") {
    val plan = TextQueries.q95_content_chunks(spark, sf())
      .queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty, s"no parquet scan found:\n$plan")
    readSchemas.foreach { s =>
      val cols = s.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols == Set("doc_id", "text"),
        s"scan reads $cols — boundary math needs only doc_id+text")
    }
  }

  test("q93: the word-cost map joins broadcast; corpus scan reads only source+text") {
    val plan = BpeTrain.q93_bpe_apply(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"word-cost join is not broadcast:\n$plan")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.exists { s =>
      val cols = s.split(",").map(_.takeWhile(_ != ':').trim).toSet
      cols == Set("source", "text") || cols == Set("text")
    }, s"no pruned corpus scan (source,text) in:\n$readSchemas")
  }

  test("q98: the salted plan contains no CartesianProduct and equals q80's transparency bar") {
    val plan = ExtendedAnalytics.q98_salted_join(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"salt replication must be an explode, not a cross product:\n$plan")
  }
}
