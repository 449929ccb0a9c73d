package graft.queries

import graft.SparkSpec
import java.security.MessageDigest

/** Pins for q143's prefix-filtered all-pairs similarity join: an
  * independent sequential replica of the whole algorithm (keys, df
  * order, prefix, length filter, exact Jaccard) over the real corpus,
  * the EXACTNESS claim (output ≡ brute-force all-pairs at the
  * threshold — prefix filtering may prune candidates, never results),
  * and the pruning claim (candidate pairs ≪ n²/2).
  */
class AllPairsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def keySet(text: String): Set[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      .map(sh => java.lang.Long.parseLong(md5hex(sh).take(15), 16))
      .toSet
  }

  private def jacHalf(a: Set[Long], b: Set[Long]): Option[(Long, Long)] = {
    val i = (a & b).size.toLong
    val u = a.size + b.size - i
    if (u > 0 && i * 2 >= u) Some((i, u)) else None
  }

  test("q143: equals brute-force all-pairs at J >= 1/2 (exactness, not recall)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), keySet(r.getString(1))))
    val brute = (for {
      (a, ka) <- docs; (b, kb) <- docs if a < b
      iu <- jacHalf(ka, kb)
    } yield ((a, b), (ka.size.toLong, kb.size.toLong, iu._1, iu._2,
      iu._1 * 1000000L / iu._2))).toMap
    val got = TextQueries.q143_allpairs(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2).toLong, r.getInt(3).toLong, r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === brute)
    assert(got.nonEmpty) // the corpus's planted near-dups must surface
  }

  test("q143: prefix candidates genuinely prune (rare-first order keeps hot keys out)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), keySet(r.getString(1))))
    val dfreq = docs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val pref = docs.map { case (id, ks) =>
      val ordered = ks.toSeq.sortBy(k => (dfreq(k), k))
      (id, ks.size, ordered.take(ks.size / 2 + 1).toSet)
    }
    val cand = (for {
      (a, na, pa) <- pref; (b, nb, pb) <- pref
      if a < b && (pa & pb).nonEmpty && nb * 2 >= na && nb <= na * 2
    } yield (a, b)).toSet
    val all = docs.length.toLong * (docs.length - 1) / 2
    assert(cand.size < all / 10,
      s"prefix join produced ${cand.size} candidates of $all possible pairs")
    // and every true result pair is a candidate (the prefix theorem)
    val results = TextQueries.q143_allpairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(results.subsetOf(cand))
  }

  test("q143: a sub-threshold pair sharing only boilerplate never surfaces") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ap").toString
    val boiler = "copyright notice all rights reserved please read this"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$boiler lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.q143_allpairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6)))
    // 1 and 3 are identical (jac 10^6); 2 shares only the boilerplate
    // head (J < 1/2 against either) and must not pair
    assert(got.toSeq === Seq((1L, 3L, 1000000L)))
  }
}
