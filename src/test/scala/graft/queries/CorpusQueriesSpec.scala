package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusQueriesSpec extends SparkSpec {

  test("approx sketches stay within tolerance of exact values") {
    // two corpora of different size/cardinality: sketch error bounds
    // that only hold on one dataset are a tuning accident, not a bound
    for (dir <- Seq(sf(), sf("sf0.01"))) {
      val approx = CorpusQueries.q41_approx_stats(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val exact = graft.Tables.load(spark, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("users"),
          expr("percentile(value, 0.5)").as("p50"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      exact.foreach { case (t, (users, p50)) =>
        val (aUsers, aP50) = approx(t)
        assert(math.abs(aUsers - users).toDouble / users <= 0.05,
          s"$dir $t: HLL $aUsers vs exact $users")
        assert(math.abs(aP50 - p50) / math.max(p50, 1.0) <= 0.05,
          s"$dir $t: approx p50 $aP50 vs exact $p50")
      }
    }
  }

  test("tfidf surfaces rare terms over stopwords") {
    val top = CorpusQueries.q40_tfidf(spark, sf())
      .filter(col("rk") === 1)
      .select("doc_id", "term", "df")
      .collect()
    assert(top.nonEmpty)
    // a doc's top term should never be a corpus-wide stopword: its df
    // must be below the maximum document frequency in the corpus
    val maxDf = top.map(_.getLong(2)).max
    val total = graft.Tables.load(spark, sf(), "documents").count()
    assert(maxDf < total, s"top terms look like stopwords (df=$maxDf of $total docs)")
  }
}
