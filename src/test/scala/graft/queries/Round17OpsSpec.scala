package graft.queries

import graft.SparkSpec

/** Round-17 pins: streamed index ingest for the two VECTOR families
  * must be a pure transport change — the drained stream's merged
  * artifact searches exactly like the batch append leg it lowers
  * (both run the same frozen models over the same b73| split, so the
  * equality is deterministic, not approximate).
  */
class Round17OpsSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("q320: streamed IVF ingest equals the batch append leg row for row") {
    val dir = sf("sf0.001")
    assert(sameRows(VectorQueries.q320_stream_ivf_ingest(spark, dir),
      VectorQueries.q227_ivf_index_update(spark, dir)),
      "stream-ingested inverted file diverged from the batch append")
  }

  test("q321: streamed PQ ingest equals the batch append leg row for row") {
    val dir = sf("sf0.001")
    assert(sameRows(VectorQueries.q321_stream_pq_ingest(spark, dir),
      VectorQueries.q296_pq_index_update(spark, dir)),
      "stream-encoded code table diverged from the batch append")
  }

  test("q322: the policy compacts the wasteful log, leaves the clean one, and the folded artifact scores like always-compact") {
    val dir = sf("sf0.001")
    val rows = LanguageModel.q322_lm_auto_compact(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val er = rows("erased"); val cl = rows("clean")
    assert(er.getLong(er.fieldIndex("compacted")) === 1L,
      "the tombstone-heavy log was not compacted")
    assert(cl.getLong(cl.fieldIndex("compacted")) === 0L,
      "the clean log was compacted — pure write amplification")
    // no-op branch: the log is physically untouched
    assert(cl.getLong(cl.fieldIndex("n_rows_after")) ===
      cl.getLong(cl.fieldIndex("n_rows_before")))
    // compact branch: the artifact holds exactly the live bigrams
    assert(er.getLong(er.fieldIndex("n_rows_after")) ===
      er.getLong(er.fieldIndex("n_live")))
    assert(er.getLong(er.fieldIndex("n_rows_after")) <
      er.getLong(er.fieldIndex("n_rows_before")))
  }

  test("maintainLog: the chosen artifact always scores like the always-compact leg; below threshold nothing is written") {
    import org.apache.hadoop.fs.Path
    val dir = sf("sf0.001")
    val work = graft.io.Scratch.dir(spark, "graft-q322spec-")
    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val docs = graft.Tables.load(spark, dir, "documents")
      LanguageModel.countsOf(docs).write.parquet(s"$work/clean")
      val (waste, compacted, path) = LanguageModel.maintainLog(
        spark, s"$work/clean", LanguageModel.autoCompactThresholdPpm)
      assert(waste === 0L && !compacted && path === s"$work/clean")
      assert(!fs.exists(new Path(s"$work/clean_v1")),
        "no-op branch wrote an artifact anyway")
      // the decisive branch is covered by q322's oracle; here pin that
      // a compacted artifact is a pure representation change: fold a
      // zero-waste log by force and the merged view is identical
      val before = LanguageModel.countsOf(docs).collect().toSet
      val (_, forced, v1) = LanguageModel.maintainLog(spark, s"$work/clean", -1L)
      assert(forced && v1 === s"$work/clean_v1")
      assert(spark.read.parquet(v1).collect().toSet === before,
        "compaction changed the merged counts")
    } finally fs.delete(new Path(work), true)
  }
}
