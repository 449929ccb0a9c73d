package graft.queries

import graft.SparkSpec

/** The cleared z-test `4(nx − S)² > 9(nQ − S²)` against hand-computed
  * moments, plus the float-free property the formulation exists for.
  */
class ZScoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (String, Long, Double)*) =
    DistributionQueries.detectOutliers(
      rows.toDF("event_type", "event_id", "value"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("a planted spike is the one outlier; the algebra matches hand computation") {
    // cents: 1000×4 and 10000 → n=5, S=14000, Q=1.04e8
    // spike: 4(5·10000−14000)² = 5.184e9 > 9(5Q−S²) = 2.916e9  ✓
    // base:  4(5·1000−14000)²  = 3.24e8  ≤ 2.916e9             ✗
    val out = run(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0),
      ("a", 4L, 10.0), ("a", 5L, 100.0))
    assert(out("a") === ((1L, 5L)))
  }

  test("a constant group has zero variance and zero outliers (no division blowup)") {
    val out = run(("c", 1L, 7.0), ("c", 2L, 7.0), ("c", 3L, 7.0))
    assert(out("c") === ((0L, 0L)))
  }

  test("groups are independent: a spike in one group never flags another") {
    val out = run(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0),
      ("a", 4L, 10.0), ("a", 5L, 100.0),
      ("b", 6L, 10.0), ("b", 7L, 10.0), ("b", 8L, 10.0), ("b", 9L, 10.0))
    assert(out("a")._1 === 1L)
    assert(out("b") === ((0L, 0L)))
  }

  test("threshold boundary: exactly k standard deviations is NOT an outlier (strict >)") {
    // two symmetric values: mean = 15, σ = 5 (population); each point is
    // exactly 1σ < 1.5σ away → not flagged
    val out = run(("e", 1L, 10.0), ("e", 2L, 20.0))
    assert(out("e") === ((0L, 0L)))
  }
}
