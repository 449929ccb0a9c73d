package graft.meta

import org.scalatest.funsuite.AnyFunSuite

class MetadataSpec extends AnyFunSuite {

  private val validJson =
    """{
      |"processing_mode": "incremental",
      |"dataflows": [{
      |  "name": "flow1",
      |  "sources": [{
      |    "name": "src", "path": "/data/batch-{date}/input.json", "format": "json",
      |    "required": true,
      |    "schema": {"type": "struct", "fields": [
      |      {"name": "id", "type": "string", "nullable": false},
      |      {"name": "age", "type": "integer", "nullable": true}]},
      |    "schema_enforcement": {"enabled": true},
      |    "options": {"multiLine": false}
      |  }],
      |  "transformations": [
      |    {"name": "meta", "type": "add_fields", "params": {
      |      "input": "src",
      |      "addFields": [{"name": "b", "function": "batch_id"}]}},
      |    {"name": "val", "type": "validate_fields", "params": {
      |      "input": "meta",
      |      "validations": [
      |        {"field": "id", "rules": ["notNull", "notEmpty", {"name": "regex", "params": "^[A-Z]+$"}]},
      |        {"field": "age", "rules": [{"name": "minValue", "params": 18}]}]}}
      |  ],
      |  "sinks": [{"input": "val_ok", "name": "ok", "path": "/out/{date}", "format": "json", "saveMode": "overwrite"}]
      |}],
      |"consolidation": {
      |  "enabled": true,
      |  "ok_records": {
      |    "input_pattern": "/out/batch-*/part*",
      |    "output_path": "/consolidated",
      |    "deduplication": {"enabled": true, "key_column": "id",
      |      "order_by": "batch_date", "order_direction": "DESC",
      |      "tie_breaker": "record_id"}}}
      |}""".stripMargin

  test("parses a full metadata document") {
    val meta = Metadata.parse(validJson)
    assert(meta.processingMode == "incremental")
    val flow = meta.dataflows.head
    assert(flow.sources.head.schemaEnforced)
    assert(flow.sources.head.options == Map("multiLine" -> "false"))
    assert(flow.transformations == Seq(
      AddFieldsDef("meta", "src", Seq("b" -> "batch_id")),
      ValidateFieldsDef("val", "meta", Seq(
        ValidationDef("id", Seq(NotNullRule, NotEmptyRule, RegexRule("^[A-Z]+$"))),
        ValidationDef("age", Seq(MinValueRule(18)))))))
    assert(flow.sinks.head.saveMode == "overwrite")
    val c = meta.consolidation.get
    assert(c.enabled && c.dedup.keyColumn == "id" && c.dedup.orderDirection == "DESC")
    assert(c.dedup.tieBreaker.contains("record_id"))
  }

  test("rejects unknown transformation type") {
    val bad = """{"dataflows":[{"name":"f","transformations":[
      {"name":"t","type":"explode_all","params":{"input":"x"}}]}]}"""
    val e = intercept[MetadataError](Metadata.parse(bad))
    assert(e.getMessage.contains("explode_all"))
  }

  test("rejects unknown validation rule") {
    val bad = """{"dataflows":[{"name":"f","transformations":[
      {"name":"t","type":"validate_fields","params":{"input":"x",
       "validations":[{"field":"a","rules":["isPrime"]}]}}]}]}"""
    val e = intercept[MetadataError](Metadata.parse(bad))
    assert(e.getMessage.contains("isPrime"))
  }

  test("rejects schema enforcement without a schema") {
    val bad = """{"dataflows":[{"name":"f","sources":[
      {"name":"s","path":"/p","schema_enforcement":{"enabled":true}}]}]}"""
    val e = intercept[MetadataError](Metadata.parse(bad))
    assert(e.getMessage.contains("schema"))
  }

  test("rejects schema without fields and non-struct schema") {
    intercept[MetadataError](Metadata.parse(
      """{"dataflows":[{"name":"f","sources":[{"name":"s","path":"/p",
        "schema":{"type":"struct","fields":[]}}]}]}"""))
    intercept[MetadataError](Metadata.parse(
      """{"dataflows":[{"name":"f","sources":[{"name":"s","path":"/p",
        "schema":{"type":"map"}}]}]}"""))
  }
}
