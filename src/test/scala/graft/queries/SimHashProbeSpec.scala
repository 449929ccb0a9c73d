package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q69's claim: Hamming-adjacent probing finds every pair q27's
  * exact-collision grouping finds, PLUS the one-bit-different
  * near-dups q27 structurally misses — and nothing beyond Hamming 1.
  */
class SimHashProbeSpec extends SparkSpec {

  test("probe candidates are exactly the Hamming<=1 pairs: superset of q27 collisions") {
    val base = TextQueries.simhashTable(spark, sf()).persist()
    try {
      val cand = TextQueries.simhashProbePairs(base)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      // independent reference: per-doc simhash, all pairs by brute force
      val sims = base.select(col("doc_id"), col("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val wantByHamming = (for {
        (a, sa) <- sims; (b, sb) <- sims if a < b
        h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 1
      } yield (a, b) -> h).toMap

      assert(cand == wantByHamming)
      // q27's exact collisions (hamming 0) are all present...
      val exactPairs = wantByHamming.filter(_._2 == 0).keySet
      assert(exactPairs.subsetOf(cand.keySet))
      // ...and probing genuinely adds the 1-bit neighbors q27 misses
      assert(cand.values.count(_ == 1) > 0,
        "no hamming-1 candidates — probing added nothing on this corpus")
    } finally base.unpersist()
  }

  test("q69 verified output keeps only jaccard>=0.8 pairs and includes hamming-1 finds") {
    val out = TextQueries.q69_simhash_probe(spark, sf()).collect()
    assert(out.nonEmpty)
    // threshold is integer-exact (5*inter >= 4*union); the reported
    // double can sit within one ulp of 0.8
    assert(out.forall(_.getDouble(3) >= 0.8 - 1e-9))
    assert(out.forall(r => r.getLong(2) == 0L || r.getLong(2) == 1L))
    // the operator's reason to exist: true near-dups at hamming 1
    // that exact-collision q27 can never emit
    assert(out.count(_.getLong(2) == 1L) > 0)
  }
}
