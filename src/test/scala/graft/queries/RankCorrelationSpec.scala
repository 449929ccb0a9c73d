package graft.queries

import graft.SparkSpec

/** Pins q193 against a BigInt Spearman replica over q91's own output,
  * and the closed-form extremes of the formula.
  */
class RankCorrelationSpec extends SparkSpec {

  test("q193: matches a BigInt Spearman replica over q91's ranks") {
    val pairs = RetrievalQueries.q91_hybrid_rerank(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getInt(2).toLong, r.getInt(3).toLong))
    val expect = pairs.groupBy(_._1).collect { case (q, rows) if rows.length > 1 =>
      val n = BigInt(rows.length)
      val d2 = rows.map(r => BigInt(r._2 - r._3) * (r._2 - r._3)).sum
      val den = n * (n * n - 1)
      q -> ((n.toLong, d2.toLong, ((den - 6 * d2) * 1000000 / den).toLong))
    }.toMap
    val got = RetrievalQueries.q193_rank_correlation(spark, sf("sf0.01")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // rho is a correlation: bounded and not degenerate everywhere
    assert(got.values.forall(v => v._3 >= -1000000L && v._3 <= 1000000L))
  }

  test("q193 formula: perfect agreement is exactly 10^6, perfect reversal -10^6") {
    // d2 = 0 → rho = 10^6; full reversal of n=5: d2 = 40 → rho = -10^6
    def rho(n: Long, d2: Long): Long = {
      val den = BigInt(n) * (BigInt(n) * n - 1)
      ((den - 6 * d2) * 1000000 / den).toLong
    }
    assert(rho(5, 0) === 1000000L)
    assert(rho(5, 40) === -1000000L)
  }
}
