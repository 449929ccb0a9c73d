package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.meta.{FieldDef, Metadata, SchemaDef, SinkDef, SourceDef}
import org.apache.spark.sql.functions._

class SourceSinkSpec extends SparkSpec {

  private def writeLines(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes)

  private val policySchema = SchemaDef(Seq(
    FieldDef("policy_number", "string", nullable = false),
    FieldDef("driver_age", "integer", nullable = true),
    FieldDef("plate_number", "string", nullable = false)))

  test("reads JSONL with enforced schema (the reference's source format)") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    writeLines(s"$dir/input.jsonl", Seq(
      """{"policy_number":"P1","driver_age":33,"plate_number":"AB-123"}""",
      """{"policy_number":"P2","driver_age":"not-a-number","plate_number":"CD-456"}""",
      """{"policy_number":"P3","plate_number":"EF-789"}"""))
    val source = SourceDef("policy_inputs", s"$dir/input.jsonl", "json",
      required = true, Some(policySchema), schemaEnforced = true,
      options = Map("multiLine" -> "false"))
    val df = SourceReader.read(spark, source, SourceReader.Substitutions(Map.empty))
    assert(df.schema.fieldNames.toSeq ==
      Seq("policy_number", "driver_age", "plate_number"))
    val rows = df.orderBy("policy_number").collect()
    assert(rows.length == 3)
    // malformed int under an enforced schema nulls the whole row's
    // fields (PERMISSIVE semantics with explicit schema)
    assert(rows(1).isNullAt(1) || rows(1).isNullAt(0))
    assert(rows(2).isNullAt(1)) // absent optional field -> null
  }

  test("ORC roundtrips through SinkWriter + SourceReader (format-generic path)") {
    // columnar alternative to parquet, built into Spark — the
    // format-generic reader/writer must carry it with enforced schema
    // and pruned reads, no format-specific code anywhere
    val dir = Files.createTempDirectory("graft-orc").toString
    import spark.implicits._
    val data = Seq(("P1", 33, "AB-123"), ("P2", 55, "CD-456"), ("P3", 19, "EF-789"))
      .toDF("policy_number", "driver_age", "plate_number")
    val sink = SinkDef("in", "orc_out", s"$dir/out", "orc", "overwrite", Seq.empty)
    SinkWriter.write(data, sink, SourceReader.Substitutions(Map.empty))
    val source = SourceDef("orc_src", s"$dir/out", "orc",
      required = true, Some(policySchema), schemaEnforced = true,
      options = Map.empty)
    val back = SourceReader.read(spark, source, SourceReader.Substitutions(Map.empty))
    assert(back.schema.fieldNames.toSeq ==
      Seq("policy_number", "driver_age", "plate_number"))
    assert(back.orderBy("policy_number").collect().map(r =>
      (r.getString(0), r.getInt(1), r.getString(2))).toSeq ==
      data.orderBy("policy_number").collect().map(r =>
        (r.getString(0), r.getInt(1), r.getString(2))).toSeq)
    // enforced-schema read prunes: a 2-column projection reaches the
    // ORC scan as a 2-column read schema
    val plan = back.select("policy_number", "driver_age")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("plate_number"),
      s"projection did not prune the ORC scan:\n$plan")
  }

  test("reads CSV with options; {date} templating resolves") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.createDirectory(Paths.get(s"$dir/batch-2025-12-01"))
    writeLines(s"$dir/batch-2025-12-01/data.csv", Seq(
      "policy_number;driver_age;plate_number",
      "P1;41;XY-1", "P2;19;XY-2"))
    val source = SourceDef("csv_src", s"$dir/batch-{date}/data.csv", "csv",
      required = true, Some(policySchema), schemaEnforced = true,
      options = Map("header" -> "true", "sep" -> ";"))
    val df = SourceReader.read(spark, source,
      SourceReader.Substitutions(Map("date" -> "2025-12-01")))
    assert(df.count() == 2)
    assert(df.filter(col("driver_age") === 41).count() == 1)
  }

  test("optional source that fails to read is skipped, required one raises") {
    val missing = SourceDef("gone", "/nonexistent/path", "parquet",
      required = false, None, schemaEnforced = false, Map.empty)
    assert(SourceReader.readOrSkip(spark, missing,
      SourceReader.Substitutions(Map.empty)).isLeft)
    val requiredMissing = missing.copy(required = true)
    intercept[Exception] {
      SourceReader.readOrSkip(spark, requiredMissing,
        SourceReader.Substitutions(Map.empty)).map(_.count())
    }
  }

  test("partitioned sink writes hive-style layout and prunes on read") {
    val out = Files.createTempDirectory("graft-sink").toString + "/data"
    val df = graft.Tables.load(spark, sf(), "documents")
      .withColumn("day", when(col("doc_id") % 2 === 0, "2025-12-01").otherwise("2025-12-02"))
    SinkWriter.write(df,
      SinkDef("in", "out", out, "parquet", "overwrite", Seq("day")),
      SourceReader.Substitutions(Map.empty))
    assert(Files.exists(Paths.get(s"$out/day=2025-12-01")))
    val pruned = spark.read.parquet(out).filter(col("day") === "2025-12-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition pruning:\n$plan")
    assert(pruned.count() == df.filter(col("day") === "2025-12-01").count())
  }
}
