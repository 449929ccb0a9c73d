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
}
