package graft.queries

import graft.SparkSpec

/** q123's scrub semantics on a hand fixture: duplicated aligned spans
  * vanish from EVERY document carrying them, sub-span tails are exempt
  * even when textually identical, and the reassembled fingerprint is
  * the md5 of the surviving tokens in original order.
  */
class SpanScrubSpec extends SparkSpec {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("duplicated spans scrub everywhere; tails and uniques survive") {
    import spark.implicits._
    val span = RetrievalQueries.spanLen
    val a = toks("a", span)            // unique span
    val b = toks("b", span)            // span duplicated across docs 1, 2, 5
    val c = toks("c", span)            // unique span
    val tail = "t1 t2"                 // sub-span tail, shared by docs 3 and 4
    val docs = Seq(
      (1L, s"$a $b", "en", "s0", 0L),  // loses b, keeps a
      (2L, b, "en", "s0", 0L),         // fully scrubbed
      (3L, s"$c $tail", "en", "s1", 0L), // tail shared with doc 4 but exempt
      (4L, tail, "en", "s1", 0L),      // short doc: all tail, untouched
      (5L, b, "en", "s1", 0L))         // fully scrubbed twin of doc 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("spanscrub").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = RetrievalQueries.q123_span_scrub(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out === Map(
      1L -> ((2L * span, span.toLong, md5(a))),
      2L -> ((span.toLong, span.toLong, md5(""))),
      3L -> ((span + 2L, 0L, md5(s"$c $tail"))),
      4L -> ((2L, 0L, md5(tail))),
      5L -> ((span.toLong, span.toLong, md5("")))))
  }

  /** Full sequential replica of the scrub (chunk → df≥2 → cut →
    * reassemble), for generated corpora.
    */
  private def replica(texts: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val span = RetrievalQueries.spanLen
    val docs = texts.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val chunks = docs.map { case (id, tk) =>
      id -> tk.grouped(span).toSeq.map(_.mkString(" "))
    }
    val dup = chunks
      .flatMap { case (id, cs) =>
        cs.filter(_.split(" ").length == span).distinct.map(c => (c, id))
      }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    docs.map { case (id, tk) =>
      val cs = chunks.toMap.apply(id)
      val kept = cs.filter(c => c.split(" ").length != span || !dup(c))
      val keptToks = kept.map(_.split(" ").length.toLong).sum
      id -> ((tk.size.toLong, tk.size - keptToks, md5(kept.mkString(" "))))
    }.toMap
  }

  test("generated corpora with planted repeats match the replica") {
    import spark.implicits._
    // deterministic LCG corpus: small vocab + a planted repeated run in
    // every third doc so duplicated spans actually arise
    var s = 7L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    val vocab = Vector("ww", "xx", "yy", "zz", "kk")
    val planted = (1 to 16).map(i => vocab(i % vocab.size)).mkString(" ")
    val texts = (0L until 30L).map { id =>
      val n = 3 + (next() % 25).toInt
      val words = (1 to n).map(_ => vocab((next() % vocab.size).toInt))
      val t =
        if (id % 3 == 0) (words.take(n / 2) :+ planted).mkString(" ") + " " +
          words.drop(n / 2).mkString(" ")
        else words.mkString(" ")
      id -> t.trim.replaceAll("\\s+", " ")
    }
    val dir = java.nio.file.Files.createTempDirectory("spanscrub2").toString
    texts.map { case (id, t) => (id, t, "en", "s0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = RetrievalQueries.q123_span_scrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val want = replica(texts)
    assert(got === want)
    // sanity: the planted run must actually have produced scrubbing
    assert(want.values.exists(_._2 > 0))
  }
}
