package graft.queries

import graft.SparkSpec

/** q79's claim: int8 max-abs quantization preserves enough of the
  * similarity structure to be the scan-stage representation (measured
  * mean recall@5 ≈ 0.69 vs exact cosine at sf0.01 — the float index
  * is only consulted for reranking survivors at scale).
  */
class QuantizedKnnSpec extends SparkSpec {

  test("quantized top-5 recalls a majority of the exact cosine top-5") {
    val exact = VectorQueries.q28_knn_bruteforce(spark, sf())
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    val quant = VectorQueries.q79_knn_quantized(spark, sf())
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, want) =>
      (want & quant(q)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"mean recall@5 $mean%.3f below floor")
    // integer scoring: every emitted score is exact and symmetric-free
    // of float ties — per query the 5 ranks are distinct neighbors
    assert(quant.values.forall(_.size == 5))
  }
}
