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
