package graft.queries

import graft.SparkSpec

/** Pins for the round-11 retrieval/dedup/scrub additions: q202 RRF
  * fusion arithmetic, q203 precision-audit consistency with the
  * verified q25 pair set, q204 canonicalization collapse on planted
  * URL variants.
  */
class Round11OpsSpec extends SparkSpec {

  test("q202: fused score is exactly the two integer reciprocals; rank follows it") {
    val rows = RetrievalQueries.q202_rrf_fusion(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bm, cos, rrf) = (r.getInt(3), r.getInt(4), r.getLong(5))
      assert(rrf === 1000000L / (60 + bm) + 1000000L / (60 + cos))
    }
    rows.groupBy(_.getInt(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1))
      val resorted = g.sortBy(r => (-r.getLong(5), r.getLong(2)))
      assert(byRank.map(_.getLong(2)).toSeq === resorted.map(_.getLong(2)).toSeq,
        "rrf_rnk must be the (rrf_micro desc, doc_id) order")
    }
  }

  test("q203: verified candidates are exactly the q25 pair set; deciles partition candidates") {
    val audit = TextQueries.q203_lsh_precision(spark, sf()).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (d, n, v, ppm) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d >= 0 && d <= 9 && v <= n)
      assert(ppm === v * 1000000L / n)
      // a decile entirely below 0.8 can have no verified members
      if (d < 8) assert(v === 0L, s"decile $d cannot reach the 0.8 threshold")
    }
    val verifiedTotal = audit.map(_.getLong(2)).sum
    val q25Pairs = TextQueries.q25_minhash_lsh_pairs(spark, sf()).count()
    assert(verifiedTotal === q25Pairs,
      "precision audit's verified pairs must equal the shipped q25 set")
  }

  test("q209: incremental heavy hitters are indistinguishable from q118's full recompute") {
    val inc = MiningQueries.q209_incremental_topk(spark, sf()).collect().toSeq
    val full = MiningQueries.q118_heavy_hitters(spark, sf()).collect().toSeq
    assert(inc.map(_.toSeq) === full.map(_.toSeq))
  }

  test("q212: dropped docs are exactly the non-representative cluster members") {
    val budget = CurationQueries.q212_dedup_token_budget(spark, sf()).collect()
    val dropped = budget.map(r => r.getLong(1) - r.getLong(3)).sum
    val q47 = GraphQueries.q47_dup_clusters(spark, sf()).collect()
    val clusters = q47.map(_.getLong(1)).distinct.length
    assert(dropped === q47.length - clusters,
      "every cluster keeps exactly one representative")
    budget.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), "kept tokens cannot exceed raw") }
  }

  test("q213: every key sits inside its power-of-two df band") {
    val rows = TextQueries.q213_shingle_df_profile(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, minDf, maxDf) = (r.getInt(0), r.getLong(3), r.getLong(4))
      assert(minDf >= (1L << b) && maxDf < (1L << (b + 1)),
        s"bucket $b holds df outside [2^$b, 2^${b + 1})")
    }
  }

  test("q204: the four planted variants of one target collapse to one canonical URL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("urlc").toString
    // doc_ids 0..3 → same target (0 DIV 4); scheme/host case and
    // fragment presence all vary across them
    (0L to 3L).map(i => (i, "a", "t", 1L, "en"))
      .toDF("doc_id", "source", "text", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ScrubQueries.q204_url_canonical(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 1L, 750000L)))
  }
}
