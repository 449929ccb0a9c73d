package graft.queries

import graft.SparkSpec
import java.security.MessageDigest

/** Pins q185 against a brute-force replica sweep: at every threshold
  * the pair count, docs-touched count, and similarity profile equal
  * the all-pairs truth, and counts are monotone non-increasing in
  * the threshold.
  */
class ThresholdSweepSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def keySet(text: String): Set[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      .map(sh => java.lang.Long.parseLong(md5hex(sh).take(15), 16)).toSet
  }

  test("q185: every sweep row equals the brute-force truth; counts monotone") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), keySet(r.getString(1))))
    val expect = TextQueries.sweepThresholds.map { case (num, den) =>
      val pairs = for {
        (a, ka) <- docs; (b, kb) <- docs if a < b
        i = (ka & kb).size.toLong
        u = ka.size + kb.size - i
        if u > 0 && i * den >= u * num
      } yield (a, i * 1000000L / u)
      val n = pairs.length.toLong
      (s"$num/$den", n, pairs.map(_._1).distinct.length.toLong,
        if (n == 0) 0L else pairs.map(_._2).min,
        if (n == 0) 0L
        else (pairs.map(p => BigInt(p._2)).sum / n).toLong)
    }
    val got = TextQueries.q185_threshold_sweep(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === expect)
    val counts = got.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
