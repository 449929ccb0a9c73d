package graft.queries

import graft.SparkSpec
import graft.meta.{Metadata, MetadataError}

/** The declared-curation contract: q276's JSON-configured funnel must
  * reproduce q86's hand-composed one exactly (same constants → same
  * numbers), the config must be LOAD-BEARING (changing a rule changes
  * the funnel), and the parser must fail fast on every malformed
  * declaration — config errors surface at load time, never as a wrong
  * plan on the cluster.
  */
class CurationFlowSpec extends SparkSpec {

  test("q276 declared funnel == q86 hand-composed funnel, column for column") {
    val dir = sf()
    val declared = CurationFlow.q276_declared_curation(spark, dir)
    val hand = CurationQueries.q86_curation_e2e(spark, dir)
    assert(declared.columns.toSeq === hand.columns.toSeq)
    val d = declared.collect().map(_.toSeq)
    val h = hand.collect().map(_.toSeq)
    assert(d.length === h.length && d.nonEmpty)
    d.zip(h).foreach { case (a, b) => assert(a === b) }
  }

  test("the config is load-bearing: a stricter rule shrinks the quality stage") {
    val strict = CurationFlow.declaredCurationJson
      .replace("\"op\": \"lt\", \"value\": 10", "\"op\": \"lt\", \"value\": 40")
    val cur = Metadata.parseCuration(strict)
    val got = CurationFlow.run(spark, sf(), cur)
      .selectExpr("sum(n_quality)", "sum(n_raw)").collect().head
    val base = CurationFlow.q276_declared_curation(spark, sf())
      .selectExpr("sum(n_quality)").collect().head.getLong(0)
    assert(got.getLong(0) < base,
      s"min-tokens 40 should drop more docs than 10 (${got.getLong(0)} vs $base)")
  }

  test("a stage subset reorders freely: quality-only config still reports") {
    val json =
      """{"curation": {"table": "documents", "id_column": "doc_id",
        |  "text_column": "text", "report_by": "source", "stages": [
        |  {"type": "quality_filter", "name": "quality", "rules": [
        |    {"reason": "low_quality", "metric": "quality", "op": "lt", "value": 0.4}]}
        |]}}""".stripMargin
    val out = CurationFlow.run(spark, sf(), Metadata.parseCuration(json))
    assert(out.columns.toSeq === Seq("source", "n_raw", "n_quality", "tokens_final"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // the generated oracle for a subset config parses down to plain WITH
    val sql = CurationFlow.oracleSql(Metadata.parseCuration(json))
    assert(!sql.startsWith("WITH RECURSIVE"))
  }

  test("declared mixture_sample == q36 hand-composed mixture, source for source") {
    val json =
      """{"curation": {"table": "documents", "id_column": "doc_id",
        |  "text_column": "text", "report_by": "source", "stages": [
        |  {"type": "mixture_sample", "name": "mix", "salt": "mix-1",
        |   "by": "source", "weights": [
        |    {"group": "src0", "keep16": 8}, {"group": "src1", "keep16": 4},
        |    {"group": "src2", "keep16": 2}, {"group": "src3", "keep16": 1}]}
        |]}}""".stripMargin
    val declared = CurationFlow.run(spark, sf(), Metadata.parseCuration(json))
      .select("source", "n_mix").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hand = CorpusQueries.q36_mixture_sample(spark, sf())
      .select("source", "n_kept").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q36 reports only sources that keep >0 docs; the declared funnel
    // reports every source — the kept counts must agree where both speak
    hand.foreach { case (src, n) =>
      assert(declared.get(src).contains(n), s"$src: ${declared.get(src)} vs $n")
    }
    declared.filterNot { case (s, _) => hand.contains(s) }
      .foreach { case (_, n) => assert(n == 0L) }
  }

  test("declared leakage-free split == q223's train membership in total") {
    val json =
      """{"curation": {"table": "documents", "id_column": "doc_id",
        |  "text_column": "text", "report_by": "source", "stages": [
        |  {"type": "split", "name": "train_only", "salt": "split-1",
        |   "buckets": [
        |    {"name": "1_train", "upper": 204}, {"name": "2_val", "upper": 230},
        |    {"name": "3_test", "upper": 256}],
        |   "keep": "1_train", "leakage_free": true}
        |]}}""".stripMargin
    val kept = CurationFlow.run(spark, sf(), Metadata.parseCuration(json))
      .selectExpr("sum(n_train_only)").collect().head.getLong(0)
    val q223Train = CurationQueries.q223_leakage_free_split(spark, sf())
      .filter(org.apache.spark.sql.functions.col("split") === "1_train")
      .select("n_docs").collect().head.getLong(0)
    assert(kept == q223Train, s"declared split kept $kept, q223 train $q223Train")
  }

  test("repeated stage types render per-stage oracle names, no collapsing") {
    val cur = Metadata.parseCuration(CurationFlow.multiStageCurationJson)
    val sql = CurationFlow.oracleSql(cur)
    // each stage owns its name-keyed CTE/column
    Seq("q_length_gate", "q_lang_gate", "ex_exact", "ct_bench_a", "ct_bench_b")
      .foreach(n => assert(sql.contains(n), s"oracle lost stage artifact $n"))
    // the two decontamination stages keep their OWN lists
    assert(sql.contains("'the fast key'") && sql.contains("'window big merge'"))
    // no duplicate LEFT JOIN alias anywhere
    val joins = sql.linesIterator.filter(_.contains("LEFT JOIN")).toSeq
    assert(joins.distinct.size == joins.size, s"duplicate joins in:\n$sql")
    // and the run() side agrees with itself: both quality gates bind
    val out = CurationFlow.q288_declared_curation_multi(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(raw, s1, s2, s3, s4, s5) = (1 to 6).map(r.getLong)
      assert(s1 <= raw && s2 <= s1 && s3 <= s2 && s4 <= s3 && s5 <= s4)
    }
  }

  test("declared token_budget first == q63 hand-composed budget, source for source") {
    val json =
      """{"curation": {"table": "documents", "id_column": "doc_id",
        |  "text_column": "text", "report_by": "source", "stages": [
        |  {"type": "token_budget", "name": "cap", "salt": "budget",
        |   "by": "source", "budget": 2000}
        |]}}""".stripMargin
    val declared = CurationFlow.run(spark, sf(), Metadata.parseCuration(json))
      .select("source", "n_cap").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hand = CurationQueries.q63_token_budget(spark, sf())
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(declared === hand, s"$declared vs $hand")
  }

  test("token_budget is survivor-aware: budget AFTER a filter keeps a superset") {
    // [budget, quality]: junk spends budget it never earns;
    // [quality, budget]: the cap buys only what survived — every doc
    // the naive order keeps, the honest order must keep too
    def cfg(stages: String) =
      s"""{"curation": {"table": "documents", "id_column": "doc_id",
         |  "text_column": "text", "report_by": "source",
         |  "stages": [$stages]}}""".stripMargin
    val budget =
      """{"type": "token_budget", "name": "cap", "salt": "budget",
        | "by": "source", "budget": 2000}""".stripMargin
    val quality =
      """{"type": "quality_filter", "name": "q", "rules": [
        |  {"reason": "short", "metric": "n_toks", "op": "lt", "value": 40}]}""".stripMargin
    def finals(json: String): (Long, Long) = {
      val r = CurationFlow.run(spark, sf(), Metadata.parseCuration(json))
        .selectExpr("sum(n_cap)", "sum(tokens_final)").collect().head
      (r.getLong(0), r.getLong(1))
    }
    val naiveQ = CurationFlow.run(spark, sf(),
      Metadata.parseCuration(cfg(s"$budget, $quality")))
      .selectExpr("sum(n_q)", "sum(tokens_final)").collect().head
    val (honestDocs, honestToks) = finals(cfg(s"$quality, $budget"))
    assert(honestDocs >= naiveQ.getLong(0) && honestToks >= naiveQ.getLong(1),
      s"honest ($honestDocs docs/$honestToks toks) < naive " +
        s"(${naiveQ.getLong(0)}/${naiveQ.getLong(1)})")
    assert(honestToks > 0)
  }

  test("q291 oracle renders the guarded budget window") {
    val sql = CurationFlow.q291_oracle
    assert(sql.contains("bd_budget AS ("))
    assert(sql.contains("CASE WHEN (m_exact AND q_quality) THEN n_toks ELSE 0 END"))
    assert(sql.contains("cum_budget - n_toks < 2000"))
  }

  test("q292 stream == batch run of the same config, row for row") {
    val cur = Metadata.parseCuration(CurationFlow.streamCurationJson)
    val streamed = CurationFlow.q292_declared_curation_stream(spark, sf())
    val batch = CurationFlow.run(spark, sf(), cur)
    assert(streamed.columns.toSeq === batch.columns.toSeq)
    val s = streamed.collect().map(_.toSeq)
    val b = batch.collect().map(_.toSeq)
    assert(s.length === b.length && s.nonEmpty)
    s.zip(b).foreach { case (a, e) => assert(a === e) }
  }

  test("q298 stream (index-backed near-dedup) == batch run of the same config, row for row") {
    val cur = Metadata.parseCuration(CurationFlow.streamNearDupCurationJson)
    val streamed = CurationFlow.q298_declared_stream_neardup(spark, sf())
    val batch = CurationFlow.run(spark, sf(), cur)
    assert(streamed.columns.toSeq === batch.columns.toSeq)
    val s = streamed.collect().map(_.toSeq)
    val b = batch.collect().map(_.toSeq)
    assert(s.length === b.length && s.nonEmpty)
    s.zip(b).foreach { case (a, e) => assert(a === e) }
    // the near-dup stage genuinely dropped rows in flight (the config
    // isn't vacuous on this corpus)
    val report = streamed.collect()
    val raw = report.map(r => r.getLong(r.fieldIndex("n_raw"))).sum
    val kept = report.map(r => r.getLong(r.fieldIndex("n_neardup"))).sum
    assert(kept < raw, "dedup_near dropped nothing — fixture corpus has near-dups")
  }

  test("runStream without an index still fails fast on dedup_near; with one it submits") {
    val cur = Metadata.parseCuration(CurationFlow.streamNearDupCurationJson)
    val docs = graft.Tables.load(spark, sf(), "documents")
    val e = intercept[MetadataError](CurationFlow.runStream(cur, docs))
    assert(e.getMessage.contains("not streamable") &&
      e.getMessage.contains("neardup") && e.getMessage.contains("index"))
  }

  test("runStream fails fast on corpus-membership stages") {
    val cur = Metadata.parseCuration(CurationFlow.declaredCurationJson)
    val docs = graft.Tables.load(spark, sf(), "documents")
    val e = intercept[MetadataError](CurationFlow.runStream(cur, docs))
    assert(e.getMessage.contains("not streamable") &&
      e.getMessage.contains("dedup_exact"))
  }

  test("parser fails fast on malformed sampling declarations") {
    def bad(json: String, hint: String): Unit = {
      val e = intercept[MetadataError](Metadata.parseCuration(json))
      assert(e.getMessage.toLowerCase.contains(hint),
        s"message '${e.getMessage}' does not mention '$hint'")
    }
    def stage(body: String): String =
      s"""{"curation": {"table": "documents", "id_column": "doc_id",
         |  "text_column": "text", "report_by": "source",
         |  "stages": [$body]}}""".stripMargin
    bad(stage("""{"type": "mixture_sample", "name": "m", "salt": "x",
                | "by": "source", "weights": [{"group": "a", "keep16": 17}]}""".stripMargin),
      "[0, 16]")
    bad(stage("""{"type": "mixture_sample", "name": "m", "salt": "x",
                | "by": "source", "weights": []}""".stripMargin), "no weights")
    bad(stage("""{"type": "mixture_sample", "name": "m", "salt": "a|b",
                | "by": "source", "weights": [{"group": "a", "keep16": 8}]}""".stripMargin),
      "salt")
    bad(stage("""{"type": "split", "name": "s", "salt": "x", "keep": "t",
                | "buckets": [{"name": "t", "upper": 200}]}""".stripMargin), "256")
    bad(stage("""{"type": "split", "name": "s", "salt": "x", "keep": "zz",
                | "buckets": [{"name": "t", "upper": 256}]}""".stripMargin), "unknown bucket")
    bad(stage("""{"type": "split", "name": "s", "salt": "x", "keep": "t",
                | "buckets": [{"name": "t", "upper": 200},
                |             {"name": "u", "upper": 100}]}""".stripMargin),
      "strictly increasing")
    bad(stage("""{"type": "token_budget", "name": "b", "salt": "x",
                | "by": "source", "budget": 0}""".stripMargin), "positive")
    bad(stage("""{"type": "token_budget", "name": "b", "salt": "x",
                | "budget": 100}""".stripMargin), "missing 'by'")
    // leakage-free split needs the signature family's columns
    bad("""{"curation": {"table": "documents", "id_column": "other_id",
          | "text_column": "text", "report_by": "source", "stages": [
          | {"type": "split", "name": "s", "salt": "x", "keep": "t",
          |  "leakage_free": true,
          |  "buckets": [{"name": "t", "upper": 256}]}]}}""".stripMargin, "signature")
  }

  test("parser fails fast on malformed declarations") {
    def bad(json: String, hint: String): Unit = {
      val e = intercept[MetadataError](Metadata.parseCuration(json))
      assert(e.getMessage.toLowerCase.contains(hint),
        s"message '${e.getMessage}' does not mention '$hint'")
    }
    bad("""{"curation": {"table": "documents", "id_column": "doc_id",
          | "text_column": "text", "report_by": "source", "stages": [
          | {"type": "resample", "name": "x"}]}}""".stripMargin, "unsupported curation stage")
    bad("""{"curation": {"table": "documents", "id_column": "doc_id",
          | "text_column": "text", "report_by": "source", "stages": [
          | {"type": "quality_filter", "name": "q", "rules": [
          |   {"reason": "r", "metric": "lang_det", "op": "lt", "value": 3}]}]}}""".stripMargin,
      "not supported")
    bad("""{"curation": {"table": "documents", "id_column": "doc_id",
          | "text_column": "text", "report_by": "source", "stages": [
          | {"type": "dedup_exact", "name": "a"},
          | {"type": "dedup_exact", "name": "a"}]}}""".stripMargin, "duplicate")
    bad("""{"curation": {"table": "documents", "id_column": "doc_id",
          | "text_column": "text", "report_by": "source", "stages": [
          | {"type": "decontaminate", "name": "d", "shingles": []}]}}""".stripMargin, "empty")
    bad("""{"curation": {"table": "events", "id_column": "event_id",
          | "text_column": "event_type", "report_by": "event_type", "stages": [
          | {"type": "dedup_near", "name": "n"}]}}""".stripMargin, "signature")
    bad("""{"curation": {"table": "documents", "id_column": "doc_id",
          | "text_column": "text", "report_by": "source", "stages": []}}""".stripMargin,
      "no stages")
  }
}
