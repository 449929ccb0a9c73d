package graft.queries

import graft.SparkSpec
import graft.functions.HashFunctions
import org.apache.spark.sql.functions._

/** Pins the corpus-adaptive simhash width policy (q69): the Scala step
  * function, the SQL CASE rendered from the same thresholds table, the
  * popcount hamming, and the width-parameterized probe path.
  */
class SimHashWidthSpec extends SparkSpec {

  private val H = HashFunctions

  test("width policy: floor 16, +2 bits per corpus doubling past 1000, cap 62") {
    assert(H.simhashWidthFor(1) == 16)
    assert(H.simhashWidthFor(500) == 16)
    assert(H.simhashWidthFor(1000) == 16)
    assert(H.simhashWidthFor(1001) == 18)
    assert(H.simhashWidthFor(5000) == 22)   // sf0.1 documents
    assert(H.simhashWidthFor(50000) == 28)  // 10x replica
    assert(H.simhashWidthFor(Long.MaxValue) == 62)
    // monotone non-decreasing, always even, always in [16, 62]
    val probePoints = Seq(1L, 999L, 1000L, 1001L, 4096L, 1000000L,
      1000000000L, Long.MaxValue)
    val ws = probePoints.map(H.simhashWidthFor)
    assert(ws == ws.sorted)
    assert(ws.forall(w => w >= 16 && w <= 62 && w % 2 == 0))
  }

  test("rendered width CASE agrees with the Scala step function (CASE is dialect-portable)") {
    // boundary-heavy sample: each threshold, its neighbors, and far tails
    val ns = (0 to 22).flatMap(k => Seq(1000L * (1L << k) - 1, 1000L * (1L << k), 1000L * (1L << k) + 1)) ++
      Seq(1L, Long.MaxValue)
    val rows = ns.map(n => s"(CAST($n AS BIGINT))").mkString(",")
    val got = spark.sql(
      s"SELECT n, ${H.simhashWidthCaseSql("n")} AS w FROM VALUES $rows t(n)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n => assert(got(n) == H.simhashWidthFor(n), s"n=$n") }
  }

  test("popcount hamming equals the unrolled per-bit form on 62-bit fingerprints") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(64)((rnd.nextLong() & ((1L << 62) - 1), rnd.nextLong() & ((1L << 62) - 1))) :+
      ((0L, 0L)) :+ (((1L << 62) - 1, 0L))
    val rows = pairs.map { case (a, b) => s"(CAST($a AS BIGINT), CAST($b AS BIGINT))" }.mkString(",")
    val df = spark.sql(
      s"""SELECT ${H.hammingCountSql("a", "b", spark = true)} AS fast,
         |${H.hammingSql("a", "b", spark = true, 62)} AS slow
         |FROM VALUES $rows t(a, b)""".stripMargin)
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    assert(df.schema("fast").dataType.typeName == "long")
  }

  test("width-parameterized probe path matches brute-force Hamming<=1 at a non-floor width") {
    val width = 22
    val base = TextQueries.simhashTable(spark, sf(), width).persist()
    try {
      val cand = TextQueries.simhashProbePairs(base, width)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val sims = base.select(col("doc_id"), col("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val want = (for {
        (a, sa) <- sims; (b, sb) <- sims if a < b
        h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 1
      } yield (a, b) -> h).toMap
      assert(cand == want)
      // fingerprints genuinely use the asked-for width, not the floor
      assert(sims.map(_._2).exists(_ >= (1L << 16)),
        "no fingerprint set a bit above the 16-bit floor at width 22")
    } finally base.unpersist()
  }
}
