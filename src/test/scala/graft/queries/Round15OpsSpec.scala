package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 operator pins: the compaction legs must equal their
  * tombstone-masked reads bit-for-bit with no erased id surviving
  * (q261's contract extended to BM25 and IVF), q277's fixed trade
  * pair must stay live in BOTH directions (a testdata regen cannot
  * silently degenerate the constant), and q290's priority split must
  * populate both classes.
  */
class Round15OpsSpec extends SparkSpec {

  // ---------- q286 ----------

  test("q286: compacted BM25 read equals the tombstone-masked read; erased ids gone") {
    val dir = sf("sf0.001")
    val compacted = RetrievalQueries.q286_bm25_compact(spark, dir)
    val masked = RetrievalQueries.q230_bm25_erasure(spark, dir)
    assert(compacted.exceptAll(masked).isEmpty && masked.exceptAll(compacted).isEmpty,
      "BM25 compaction diverged from the masked read")
    val erased = (c: org.apache.spark.sql.Column) =>
      substring(md5(concat(lit("del|"), c.cast("string"))), 1, 1).isin("0", "1")
    assert(compacted.filter(erased(col("doc_id"))).count() === 0L)
    assert(compacted.count() > 0L)
  }

  // ---------- q287 ----------

  test("q287: compacted IVF probe equals the tombstone-masked probe; erased ids gone") {
    val dir = sf("sf0.001")
    val compacted = VectorQueries.q287_ivf_compact(spark, dir)
    val masked = VectorQueries.q252_ivf_erasure(spark, dir)
    assert(compacted.exceptAll(masked).isEmpty && masked.exceptAll(compacted).isEmpty,
      "IVF compaction diverged from the masked probe")
    assert(compacted.filter(VectorQueries.ivfErased(col("n_id"))).count() === 0L)
    assert(compacted.filter(VectorQueries.ivfErased(col("q_id"))).count() === 0L)
    assert(compacted.count() > 0L)
  }

  // ---------- q293–q295: PQ lifecycle ----------

  test("q293: stored-PQ search equals the fresh-train q112, row for row") {
    val dir = sf("sf0.001")
    val stored = VectorQueries.q293_pq_index_persist(spark, dir)
    val fresh = VectorQueries.q112_knn_ivfpq(spark, dir)
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "stored-artifact PQ search diverged from fresh train-and-search")
    assert(stored.count() > 0L)
  }

  test("q294: PQ tombstone mask equals rebuild-without-erased; q295 compaction equals the mask") {
    val dir = sf("sf0.001")
    val masked = VectorQueries.q294_pq_erasure(spark, dir)
    val rebuilt = VectorQueries.pqRebuiltWithout(spark, dir)
    assert(masked.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(masked).isEmpty,
      "PQ erasure mask diverged from the rebuild without the erased rows")
    val compacted = VectorQueries.q295_pq_compact(spark, dir)
    assert(compacted.exceptAll(masked).isEmpty && masked.exceptAll(compacted).isEmpty,
      "PQ compaction diverged from the masked read")
    assert(compacted.filter(VectorQueries.ivfErased(col("n_id"))).count() === 0L)
    assert(compacted.filter(VectorQueries.ivfErased(col("q_id"))).count() === 0L)
    assert(compacted.count() > 0L)
  }

  // ---------- q277 ----------

  test("q277: both trade directions are live at the gated SF") {
    val rows = RelationalQueries.q277_nation_trade(spark, sf("sf0.001"))
      .select("supp_nation").distinct().collect().map(_.getString(0)).toSet
    assert(rows === Set(RelationalQueries.tradePair._1, RelationalQueries.tradePair._2),
      s"expected both directions of ${RelationalQueries.tradePair}, got $rows — " +
        "the fixed pair degenerated (testdata regen?); re-pick tradePair")
  }

  // ---------- q290 ----------

  test("q290: both priority classes populate in every category") {
    val rows = RelationalQueries.q290_priority_lines(spark, sf("sf0.001")).collect()
    assert(rows.length === 3) // A / N / R
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L,
        s"degenerate priority split for ${r.getString(0)}: $r")
    }
  }
}
