package graft.queries

import graft.SparkSpec
import java.security.MessageDigest
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative property checks for the continuation operators, in the
  * OperatorPropertySpec style (fixed seeds, real Spark plans,
  * independent sequential replicas): HITS on random bipartite graphs,
  * the KS tail on random count tables, and the prefix-filtered
  * all-pairs join on random small corpora.
  */
class GenerativeOpsSpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  test("hitsLoop matches the BigInt replica on random bipartite graphs") {
    val s = spark
    import s.implicits._
    val edgeGen = for {
      c <- Gen.choose(1L, 6L)
      sup <- Gen.choose(101L, 108L)
    } yield (c, sup)
    val scale = BigInt("1000000000000")
    for (seed <- 0 until 6) {
      val edges = sample(Gen.listOfN(15, edgeGen), 300L + seed).distinct
      var hub: Map[Long, BigInt] =
        edges.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
      var auth: Map[Long, BigInt] = Map.empty
      for (_ <- 1 to GraphQueries.hitsRounds) {
        val ar = edges.groupBy(_._2).map { case (sp, es) =>
          sp -> es.map(e => hub(e._1)).sum }
        val asum = ar.values.sum
        auth = ar.map { case (sp, v) => sp -> v * scale / asum }
        val hr = edges.groupBy(_._1).map { case (c, es) =>
          c -> es.map(e => auth(e._2)).sum }
        val hsum = hr.values.sum
        hub = hr.map { case (c, v) => c -> v * scale / hsum }
      }
      val expect =
        hub.map { case (c, v) => ("customer", c) -> v.toLong } ++
          auth.map { case (sp, v) => ("supplier", sp) -> v.toLong }
      val got = GraphQueries.hitsLoop(edges.toDF("c", "s"),
          GraphQueries.hitsRounds).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expect, s"seed $seed")
    }
  }

  test("ksFromCounts matches the BigInt replica on random count tables") {
    val s = spark
    import s.implicits._
    val rowGen = for {
      tpe <- Gen.oneOf("x", "y")
      cents <- Gen.choose(1L, 20L)
      ca <- Gen.choose(0L, 5L)
      cb <- Gen.choose(0L, 5L)
    } yield (tpe, cents, ca, cb)
    for (seed <- 0 until 6) {
      val rows = sample(Gen.listOfN(30, rowGen), 500L + seed)
        .groupBy(r => (r._1, r._2))
        .map { case ((t, c), rs) =>
          (t, c, rs.map(_._3).sum, rs.map(_._4).sum) }.toSeq
        .filter(r => r._3 + r._4 > 0)
      val byType = rows.groupBy(_._1).filter { case (_, rs) =>
        rs.map(_._3).sum > 0 && rs.map(_._4).sum > 0 } // KS needs both samples
      val kept = byType.values.flatten.toSeq
      if (kept.nonEmpty) {
        val expect = byType.map { case (t, rs) =>
          val na = BigInt(rs.map(_._3).sum); val nb = BigInt(rs.map(_._4).sum)
          var (cuma, cumb) = (BigInt(0), BigInt(0))
          var dmax = BigInt(-1); var at = 0L
          for ((_, c, ca, cb) <- rs.sortBy(_._2)) {
            cuma += ca; cumb += cb
            val d = (cuma * nb - cumb * na).abs
            if (d > dmax) { dmax = d; at = c }
          }
          t -> ((na.toLong, nb.toLong, (dmax * 1000000 / (na * nb)).toLong, at))
        }
        val got = DistributionQueries.ksFromCounts(
            kept.toDF("event_type", "cents", "ca", "cb")).collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        assert(got === expect, s"seed $seed")
      }
    }
  }

  private def md5hex(str: String): String =
    MessageDigest.getInstance("MD5").digest(str.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def keySet(text: String): Set[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      .map(sh => java.lang.Long.parseLong(md5hex(sh).take(15), 16)).toSet
  }

  test("allPairsExact equals brute force on random small corpora") {
    val s = spark
    import s.implicits._
    val vocab = Vector("red", "blue", "fox", "dog", "sun", "sky", "run", "sit")
    val docGen = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    for (seed <- 0 until 4) {
      val dir = java.nio.file.Files.createTempDirectory(s"apg$seed").toString
      val texts = sample(Gen.listOfN(12, docGen), 700L + seed)
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, keySet(t)) }
      val brute = (for {
        (a, ka) <- docs; (b, kb) <- docs if a < b
        i = (ka & kb).size.toLong
        u = ka.size + kb.size - i
        if u > 0 && i * 2 >= u
      } yield (a, b, i, u)).toSet
      val got = TextQueries.q143_allpairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSet
      assert(got === brute, s"seed $seed")
    }
  }
}
