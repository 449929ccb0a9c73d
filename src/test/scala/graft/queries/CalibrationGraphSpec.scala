package graft.queries

import graft.SparkSpec
import java.sql.Timestamp

/** Pins for q171 (rank-calibration replica from the operator's own
  * scores), q172 (hand-traced Pareto shares + closure identities),
  * q173 (square-graph link prediction: the two diagonals at Jaccard
  * 10⁶), and q174 (star graph ⟹ assortativity exactly −1).
  */
class CalibrationGraphSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** orders+lineitem fixture building exactly the given supplier
    * baskets as Q1-1995 orders. */
  private def writeTradeGraph(dir: String, baskets: Seq[Seq[Long]]): Unit = {
    import spark.implicits._
    val ts = Timestamp.valueOf("1995-02-01 00:00:00")
    baskets.zipWithIndex.map { case (_, i) => (i.toLong + 1, 1L, ts) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    baskets.zipWithIndex.flatMap { case (sks, i) =>
      sks.map(sk => (i.toLong + 1, sk)) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("q171: per-source means match a replica over the operator's own scores") {
    import org.apache.spark.sql.functions._
    val scored = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("source"),
        floor(graft.functions.TextFunctions.qualityScore(col("text")) * 1000000L)
          .cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranked = scored.sortBy(r => (r._3, r._1)).zipWithIndex
      .map { case ((id, src, _), i) => (src, BigInt(i) * 1000000 / (scored.length - 1)) }
    val expect = ranked.groupBy(_._1).map { case (s, rs) =>
      s -> ((rs.length.toLong, (rs.map(_._2).sum / rs.length).toLong)) }
    val got = GovernanceQueries.q171_score_calibration(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("q172: ten equal-spend-gap customers — exact 1/55 share ladder, cum closes at 10^6") {
    import spark.implicits._
    val dir = tmp("pareto")
    (1 to 10).map(i => (i.toLong * 100, i.toLong, i.toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = DistributionQueries.q172_pareto(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === 10 && got.forall(_._2 == 1L))
    // desc rank: decile 0 = customer 10 (1000 cents of 5500 total)
    assert(got.head._3 === 1000L)
    assert(got.head._4 === 1000L * 1000000L / 5500L)
    assert(got.last._5 === 1000000L) // cumulative closes exactly
    assert(got.map(_._4).sameElements(got.map(_._4).sorted.reverse)) // shares desc
  }

  test("q173: square graph — both diagonals surface at Jaccard exactly 10^6") {
    val dir = tmp("lp")
    writeTradeGraph(dir, Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L), Seq(1L, 4L)))
    val got = GraphQueries.q173_link_prediction(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(got.toSeq === Seq(
      (1, 1L, 3L, 2L, 1000000L),
      (2, 2L, 4L, 2L, 1000000L)))
  }

  test("q174: star graph is perfectly anti-assortative — r exactly -10^6") {
    val dir = tmp("assort")
    writeTradeGraph(dir, Seq(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L)))
    val r = GraphQueries.q174_assortativity(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (6L, 12L, -1000000L))
  }
}
