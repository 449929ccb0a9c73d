package graft.queries

import graft.SparkSpec

/** The round-17 negative probe found a family of sampling/plan queries
  * whose outputs were pure functions of the doc_id space — two corpora
  * sharing an id shape but no text hashed identically, so the oracle
  * gate could not discriminate on them. Each now carries one
  * content-derived column (text length sums / per-row lengths). This
  * spec pins the property the probe checks: over two corpora with the
  * SAME ids, sources and id-hash decisions but different text, the
  * pinned outputs must differ — and must differ ONLY in the content
  * column (the id-derived schedule/plan half stays bit-identical).
  */
class ContentPinSpec extends SparkSpec {

  private def writeDocs(dir: String, textOf: Long => String): Unit = {
    import spark.implicits._
    // sources src0..src3 so the q36 mixture weights and q148
    // interleave weights both engage all their groups; src0 is hot
    // (98 docs > q233's 20-row target) so the salt plan is non-empty
    (1L to 120L).map { i =>
      val t = textOf(i)
      val src = if (i <= 90) "src0" else s"src${i % 4}"
      (i, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def tmpCorpora(): (String, String) = {
    val a = java.nio.file.Files.createTempDirectory("pin-a").toString
    val b = java.nio.file.Files.createTempDirectory("pin-b").toString
    // same id space, different text with different lengths (the real
    // testdata SFs share 2/500 lengths across scale points)
    writeDocs(a, i => s"alpha corpus document number $i with shared shape")
    writeDocs(b, i => ("beta " * (3 + (i % 5).toInt)).trim + s" doc $i")
    (a, b)
  }

  private val pinned: Seq[(String, String)] = Seq(
    // query name -> content column the pin added
    "q33" -> "sampled_chars", "q36" -> "kept_chars",
    "q131" -> "kept_chars", "q148" -> "text_chars",
    "q216" -> "text_chars", "q233" -> "src_chars",
    "q05" -> "text_chars", "q204" -> "corpus_chars",
    "q264" -> "chars_scanned")

  private def run(name: String, dir: String) = name match {
    case "q33"  => CorpusQueries.q33_deterministic_sample(spark, dir)
    case "q36"  => CorpusQueries.q36_mixture_sample(spark, dir)
    case "q131" => CorpusQueries.q131_temperature_mixture(spark, dir)
    case "q148" => CurationQueries.q148_interleave(spark, dir)
    case "q216" => CurationQueries.q216_epoch_schedule(spark, dir)
    case "q233" => ExtendedAnalytics.q233_salt_plan(spark, dir)
    case "q05"  => PipelineQueries.q05_validate_fieldmissing(spark, dir)
    case "q204" => ScrubQueries.q204_url_canonical(spark, dir)
    case "q264" => ScrubQueries.q264_scrub_idempotence(spark, dir)
  }

  test("content pins discriminate corpora sharing an id space; id halves agree") {
    val (a, b) = tmpCorpora()
    pinned.foreach { case (name, contentCol) =>
      val da = run(name, a)
      val db = run(name, b)
      val idCols = da.columns.filterNot(_ == contentCol)
      val idA = da.select(idCols.head, idCols.tail: _*).collect().map(_.toSeq)
      val idB = db.select(idCols.head, idCols.tail: _*).collect().map(_.toSeq)
      assert(idA.toSeq === idB.toSeq,
        s"$name: id-derived half should not depend on text")
      val pinA = da.select(contentCol).collect().map(_.toSeq)
      val pinB = db.select(contentCol).collect().map(_.toSeq)
      assert(pinA.toSeq !== pinB.toSeq,
        s"$name: $contentCol failed to discriminate different text")
    }
  }

  test("q184's n_events pin discriminates logs sharing a gap-free calendar") {
    import spark.implicits._
    def write(dir: String, copies: Int): Unit =
      (1 to 3).flatMap { d =>
        (1 to copies).map(c => ((d * 10 + c).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:0$c:00"),
          1L, "view", 0.0, "{}"))
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val a = java.nio.file.Files.createTempDirectory("cov-a").toString
    val b = java.nio.file.Files.createTempDirectory("cov-b").toString
    write(a, 2)
    write(b, 4) // same 3-day calendar, no gaps, twice the events
    val da = DistributionQueries.q184_coverage_gaps(spark, a)
    val db = DistributionQueries.q184_coverage_gaps(spark, b)
    val idCols = da.columns.filterNot(_ == "n_events")
    assert(da.select(idCols.head, idCols.tail: _*).collect().map(_.toSeq).toSeq ===
      db.select(idCols.head, idCols.tail: _*).collect().map(_.toSeq).toSeq)
    assert(da.select("n_events").head.getLong(0) === 6L)
    assert(db.select("n_events").head.getLong(0) === 12L)
  }
}
