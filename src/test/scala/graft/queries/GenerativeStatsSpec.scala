package graft.queries

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative checks for the exact-statistics operators on adversarial
  * tie patterns: weighted median over random heavily-tied
  * (value, weight) tables, and type-7 interpolated quantiles over
  * random duplicated-value streams — both vs sequential replicas.
  */
class GenerativeStatsSpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  test("q194 weighted median survives heavy ties on random tables") {
    val s = spark
    import s.implicits._
    // tiny value domain forces long runs of equal values
    val rowGen = for {
      v <- Gen.choose(1, 4)
      w <- Gen.choose(1, 5)
    } yield (v, w)
    for (seed <- 0 until 5) {
      val dir = java.nio.file.Files.createTempDirectory(s"wmg$seed").toString
      val rows = sample(Gen.listOfN(20, rowGen), 900L + seed)
        .zipWithIndex.map { case ((v, w), i) => (i.toLong + 1, i + 1, v, w) }
      rows.map { case (ok, ln, v, w) => (ok, ln, "N", v.toDouble, w.toDouble) }
        .toDF("l_orderkey", "l_linenumber", "l_returnflag",
          "l_extendedprice", "l_quantity")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val sorted = rows.sortBy(r => (r._3, r._1, r._2))
      val wtot = sorted.map(_._4.toLong).sum
      var cum = 0L
      val wm = sorted.find { r => cum += r._4; cum * 2 >= wtot }.get._3 * 100L
      val med = sorted((sorted.length + 1) / 2 - 1)._3 * 100L
      val r = DistributionQueries.q194_weighted_median(spark, dir).collect().head
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === (rows.length.toLong, wtot, wm, med), s"seed $seed")
    }
  }

  test("q187 interpolated quantiles survive duplicated values on random streams") {
    val s = spark
    import s.implicits._
    def ts = java.sql.Timestamp.valueOf("2024-01-10 10:00:00")
    val vGen = Gen.choose(1, 6) // duplicates guaranteed
    for (seed <- 0 until 5) {
      val dir = java.nio.file.Files.createTempDirectory(s"iqg$seed").toString
      val vals = sample(Gen.listOfN(17, vGen), 950L + seed)
      vals.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, ts, 1L, "click", v.toDouble, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val xs = vals.zipWithIndex
        .sortBy { case (v, i) => (v.toLong * 100, i) }
        .map(_._1.toLong * 100).toIndexedSeq
      val n = xs.length
      def q(num: Int): Long = {
        val h = (n - 1).toLong * num
        val k = (h / 4).toInt; val r = h % 4
        val second = if (r == 0) 0L else xs(k + 1)
        ((4 - r) * xs(k) + r * second) * 250000L
      }
      val r = DistributionQueries.q187_interp_quantiles(spark, dir).collect().head
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === (n.toLong, q(1), q(2), q(3)), s"seed $seed")
    }
  }
}
