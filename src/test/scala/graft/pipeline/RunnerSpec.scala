package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.io.{BatchDiscovery, Manifest}
import graft.meta.{Metadata, MetadataError}

class RunnerSpec extends SparkSpec {

  private def metaJson(dir: String, out: String) =
    s"""{
       |"dataflows": [{
       |  "name": "docs-flow",
       |  "sources": [
       |    {"name": "docs", "path": "$dir/documents.parquet", "format": "parquet"},
       |    {"name": "absent", "path": "$dir/nope-{date}.parquet", "format": "parquet", "required": false}
       |  ],
       |  "transformations": [
       |    {"name": "with_meta", "type": "add_fields", "params": {
       |      "input": "docs",
       |      "addFields": [
       |        {"name": "source_batch", "function": "batch_id"},
       |        {"name": "processed_run_id", "function": "run_id"},
       |        {"name": "ingestion_dt", "function": "current_timestamp"}]}},
       |    {"name": "validation", "type": "validate_fields", "params": {
       |      "input": "with_meta",
       |      "validations": [{"field": "n_chars", "rules": [{"name": "minValue", "params": 200}]}]}}
       |  ],
       |  "sinks": [
       |    {"input": "validation_ok", "name": "ok", "path": "$out/ok/batch-{date}", "format": "parquet", "saveMode": "overwrite"},
       |    {"input": "validation_ko", "name": "ko", "path": "$out/ko/batch-{date}", "format": "parquet", "saveMode": "overwrite"}
       |  ]
       |}]}""".stripMargin

  test("executes a full flow: sources, transforms, OK/KO sinks") {
    val out = Files.createTempDirectory("graft-runner").toString
    val meta = Metadata.parse(metaJson(sf(), out))
    val result = Runner.runFlow(spark, meta.dataflows.head,
      Runner.RunContext(Some("2025-12-01"), Some("r1"), Map.empty))

    assert(result.report.exists(r => r.name == "absent" && r.status == "skipped"))
    assert(result.report.filter(_.stageType == "sink").forall(_.status == "success"))

    val ok = spark.read.parquet(s"$out/ok/batch-2025-12-01")
    val ko = spark.read.parquet(s"$out/ko/batch-2025-12-01")
    val total = graft.Tables.load(spark, sf(), "documents").count()
    assert(ok.count() + ko.count() == total)
    assert(ok.columns.contains("source_batch") && !ok.columns.contains("validation_errors"))
    assert(ko.columns.contains("validation_errors"))
    assert(ok.select("source_batch").distinct().collect().map(_.getString(0)).toSeq == Seq("2025-12-01"))
  }

  test("missing required input view fails fast") {
    val meta = Metadata.parse(
      """{"dataflows":[{"name":"f","transformations":[
        {"name":"t","type":"add_fields","params":{"input":"ghost",
         "addFields":[{"name":"x","function":"run_id"}]}}]}]}""")
    val e = intercept[MetadataError] {
      Runner.runFlow(spark, meta.dataflows.head, Runner.RunContext(None, None, Map.empty))
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("manifest round-trip and watermark filtering") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    val path = s"$dir/manifest.json"
    assert(Manifest.load(spark, path).isEmpty)
    val m = Manifest.create("p").update("2025-12-01", "r1", "t1").update("2025-12-02", "r2", "t2")
    Manifest.save(spark, m, path)
    val loaded = Manifest.load(spark, path).get
    assert(loaded.lastProcessedBatch.contains("2025-12-02"))
    assert(loaded.processedBatches.map(_.batchDate) == Seq("2025-12-01", "2025-12-02"))
    assert(BatchDiscovery.filterNew(
      Seq("2025-12-01", "2025-12-02", "2025-12-03"), loaded.lastProcessedBatch) == Seq("2025-12-03"))
  }

  test("batch discovery lists date-shaped dirs only") {
    val base = Files.createTempDirectory("graft-batches")
    Seq("batch-2025-12-01", "batch-2025-12-03", "batch-junk", "other").foreach { n =>
      Files.createDirectory(base.resolve(n))
    }
    assert(BatchDiscovery.discover(spark, base.toString, "batch-") ==
      Seq("2025-12-01", "2025-12-03"))
  }
}
