package graft.queries

import graft.SparkSpec

/** Pins q188's feedback loop: the expansion vocabulary comes from
  * round-1 winners and EXCLUDES the original terms, and a document
  * sharing only expansion vocabulary — unreachable by round 1 —
  * enters the round-2 ranking (the whole point of PRF).
  */
class PrfSpec extends SparkSpec {

  test("q188: a doc with zero query terms becomes reachable through expansion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prf").toString
    val docs = Seq(
      // round-1 winners for query 0 ("dup merge batch") carry 'cargo'
      (1L, "dup merge batch cargo cargo cargo"),
      (2L, "dup merge batch cargo cargo extra"),
      (3L, "dup merge batch cargo filler words"),
      // no original term — invisible to round 1, pure expansion match
      (4L, "cargo cargo cargo cargo cargo cargo"),
      (5L, "unrelated filler text alpha beta gamma"),
      (6L, "more unrelated filler delta epsilon zeta"))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1docs = RetrievalQueries.q83_bm25(spark, dir).collect()
      .filter(_.getInt(0) == 0).map(_.getLong(1)).toSet
    assert(!r1docs.contains(4L), "fixture broken: doc 4 visible in round 1")
    val r2 = RetrievalQueries.q188_bm25_prf(spark, dir).collect()
      .filter(_.getInt(0) == 0).map(r => (r.getInt(1), r.getLong(2)))
    assert(r2.map(_._2).contains(4L),
      s"expansion failed to surface doc 4: ${r2.toSeq}")
    // original-term docs still dominate: doc 4 ranks below the winners
    assert(r2.sortBy(_._1).head._2 != 4L)
  }

  test("q188: on the real corpus the expanded ranking differs from round 1 somewhere") {
    val r1 = RetrievalQueries.q83_bm25(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getInt(3), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val r2 = RetrievalQueries.q188_bm25_prf(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(r1.keySet === r2.keySet)
    assert(r1.exists { case (q, docs) => r2(q) != docs },
      "PRF identical to round 1 for every query — expansion is a no-op")
  }
}
