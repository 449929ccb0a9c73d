package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the round-6 operators; exact values are
  * pinned by the DuckDB oracles (q81/q82/q83 in RetrievalQueries).
  */
class RetrievalQueriesSpec extends SparkSpec {

  test("q81: spans partition token count; planted dups are flagged; verdict consistent") {
    val out = RetrievalQueries.q81_span_dedup(spark, sf("sf0.01")).collect()
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
    // every document appears exactly once
    assert(out.length == docs.count())
    // n_spans is exactly tokens div spanLen per doc (chunking, no overlap)
    val expected = docs
      .select(col("doc_id"),
        (size(graft.functions.TextFunctions.tokens(col("text"))) / RetrievalQueries.spanLen)
          .cast("long").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(2) == expected(r.getLong(0))))
    // the corpus plants near-duplicates: some spans must be shared
    assert(out.map(_.getLong(3)).sum > 0, "no duplicated spans found")
    // but a mostly-unique corpus must not flag everything
    assert(out.count(_.getLong(3) > 0) * 2 < out.length)
    // verdict is exactly the majority rule
    out.foreach(r => assert(r.getBoolean(4) == (2 * r.getLong(3) <= r.getLong(2))))
  }

  test("q82: boiler counts bounded by totals; threshold binds at sf0.01") {
    val rows = RetrievalQueries.q82_boilerplate(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "boiler occurrences exceed total")
      assert(r.getLong(3) >= 0)
    }
    // at 500 docs the 1% threshold (df >= 5) is non-degenerate: some
    // but not all occurrences are boilerplate
    val (tot, boiler) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(boiler > 0 && boiler < tot)
  }

  test("q83: top-k ranked, scores descending, rare term retrieves its planting docs") {
    val out = RetrievalQueries.q83_bm25(spark, sf("sf0.01"))
    val rows = out.collect()
    val byQuery = rows.groupBy(_.getInt(0))
    assert(byQuery.keySet == RetrievalQueries.bm25Queries.map(_._1).toSet)
    byQuery.values.foreach { qs =>
      val sorted = qs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.length <= RetrievalQueries.bm25TopK)
      // scores non-increasing in rank, all positive
      sorted.map(_.getLong(2)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
      assert(sorted.last.getLong(2) > 0)
    }
    // query 0 leads with 'dup' — its top hit must actually contain the term
    val top0 = byQuery(0).minBy(_.getInt(3)).getLong(1)
    val txt = graft.Tables.load(spark, sf("sf0.01"), "documents")
      .filter(col("doc_id") === top0).select("text").head().getString(0)
    assert(txt.split("\\s+").contains("dup"))
  }
}
