package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the round-6 lifecycle/composition
  * operators (q84 persisted BM25 index, q85 CDC changelog, q86
  * curation funnel); exact values are pinned by their DuckDB oracles.
  */
class Round6OpsSpec extends SparkSpec {

  test("q84: the persisted index ranks bit-identically to the from-text build") {
    val dir = sf("sf0.01")
    val fromText = RetrievalQueries.q83_bm25(spark, dir).collect()
    val fromIndex = RetrievalQueries.q84_bm25_index_persist(spark, dir).collect()
    assert(fromText.length == fromIndex.length)
    fromText.zip(fromIndex).foreach { case (a, b) => assert(a == b) }
  }

  test("q85: changelog classifies the 1998+ ingest correctly") {
    val dir = sf("sf0.01")
    val rows = ChangeCapture.q85_cdc_changelog(spark, dir).collect()
    assert(rows.nonEmpty)
    val byOp = rows.groupBy(_.getString(0))
    // append-only flow: consolidation never loses a key
    assert(!byOp.contains("delete"))
    // inserts carry no old image, updates carry both and differ
    byOp.getOrElse("insert", Array.empty).foreach { r =>
      assert(r.isNullAt(2) && !r.isNullAt(3))
    }
    byOp.getOrElse("update", Array.empty).foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getLong(2) != r.getLong(3) || r.getString(4) != r.getString(5)
        || r.get(6) != r.get(7))
    }
    // every changed key's new image is the keep-newest over ALL orders:
    // an update's new_date can never precede its old_date
    byOp.getOrElse("update", Array.empty).foreach { r =>
      assert(r.getString(5) >= r.getString(4))
    }
  }

  test("q88: at-least-once replay emits every source event exactly once") {
    val dir = sf("sf0.001")
    val out = StreamingParity.q88_stream_dedup(spark, dir).collect()
    val events = graft.Tables.load(spark, dir, "events")
    assert(out.length == events.count())
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("q89: frame manifest covers every doc at the declared stride with correct hashes") {
    val dir = sf("sf0.001")
    val out = graft.multimodal.Multimodal.q89_frame_sample(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = out.groupBy(_.getLong(0))
    // every non-empty doc appears; sampled count matches the stride
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet)
    val L = graft.multimodal.Multimodal.frameLen
    val S = graft.multimodal.Multimodal.frameStride
    byDoc.foreach { case (id, rows) =>
      val nFrames = (docs(id).length + L - 1) / L
      assert(rows.forall(_.getLong(1) == nFrames))
      val want = (0L until nFrames by S.toLong).toSeq
      assert(rows.map(_.getLong(2)).sorted.toSeq == want)
    }
    // hash spot-check: recompute one frame's md5 from the raw text
    val r = out.head
    val txt = docs(r.getLong(0))
    val start = (r.getLong(2) * L).toInt
    val slice = txt.substring(start, math.min(start + L, txt.length))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(3) == hex)
  }

  test("q91: rerank permutes exactly the BM25 candidate set") {
    val dir = sf("sf0.01")
    val bm25 = RetrievalQueries.q83_bm25(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val rr = RetrievalQueries.q91_hybrid_rerank(spark, dir).collect()
    // same (query, doc) pairs — the dense stage may only REORDER
    assert(rr.map(r => (r.getInt(0), r.getLong(1))).toSet == bm25)
    // cos_rnk is a clean 1..n permutation per query
    rr.groupBy(_.getInt(0)).values.foreach { qs =>
      assert(qs.map(_.getInt(3)).sorted.toSeq == (1 to qs.length))
    }
  }

  test("q90: range predicate reaches the clustered scan as a pushed filter") {
    val dir = sf("sf0.001")
    val work = java.nio.file.Files.createTempDirectory("graft-q90spec-").toString
    try {
      graft.io.Layout.writeRangeClustered(
        graft.Tables.load(spark, dir, "documents").select("doc_id", "source", "n_chars"),
        s"$work/docs", numFiles = 8, "doc_id")
      val plan = spark.read.parquet(s"$work/docs")
        .filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(doc_id,100)") &&
        plan.contains("LessThan(doc_id,200)"),
        s"range predicate not pushed to the parquet scan:\n$plan")
      // ...and the pushed predicate actually PRUNES: per-file doc_id
      // ranges are disjoint and the query range intersects at most one
      // of the 8 files — a footer-stats reader touches 1 file in 8.
      // (Pushdown alone passes even on an overlapping layout; this is
      // the clustering property q90 exists to provide.)
      import org.apache.hadoop.fs.Path
      val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new Path(s"$work/docs/part-*.parquet")).map(_.getPath)
      assert(files.length >= 2, s"need >=2 clustered files, got ${files.length}")
      val ranges = files.map { p =>
        val mm = spark.read.parquet(p.toString)
          .agg(min(col("doc_id")), max(col("doc_id"))).head()
        (mm.getLong(0), mm.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, aMax), (bMin, _)) =>
          assert(aMax < bMin, s"file ranges overlap: ${ranges.mkString(", ")}")
        case _ =>
      }
      // a probe range inside one file's span intersects exactly that
      // file — disjointness makes footer-stats pruning effective
      val (midLo, midHi) = ranges(ranges.length / 2)
      val touched = ranges.count { case (lo, hi) => hi >= midLo && lo <= midHi }
      assert(touched == 1, s"probe [$midLo,$midHi] intersects $touched files")
    } finally {
      import org.apache.hadoop.fs.Path
      new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new Path(work), true)
    }
  }

  test("q86: funnel is monotone and stages agree with the standalone operators") {
    val dir = sf("sf0.01")
    val f = CurationQueries.q86_curation_e2e(spark, dir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val Seq(raw, ex, near, qual, fin) = (1 to 5).map(r.getLong)
      assert(raw >= ex && ex >= near && near >= qual && qual >= fin)
      assert(r.getLong(6) >= 0)
    }
    // stage-1 total = q23's representative count
    val nExact = f.map(_.getLong(2)).sum
    assert(nExact == TextQueries.q23_dedup_exact(spark, dir).count())
    // stage-2 drop = q60's cluster non-representatives, applied to
    // exact survivors (exact reps are by construction distinct texts,
    // so the near-dup drop hits the same ids q60 drops)
    val nNear = f.map(_.getLong(3)).sum
    val q60 = CurationQueries.q60_dedup_apply(spark, dir).count()
    assert(nNear <= q60)
  }
}
