package graft.io

import graft.SparkSpec
import graft.meta.{Metadata, SinkDef}
import org.apache.spark.sql.functions._

/** Sink compaction: a partitioned write from many upstream tasks must
  * not emit (tasks × partition values) small files; with targetFileMB
  * set, AQE rebalance bin-packs each partition directory to a bounded
  * file count near the target size.
  */
class SinkCompactionSpec extends SparkSpec {

  private def fileCounts(root: String): Map[String, Int] = {
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
    dirs.map(d => d.getName ->
      d.listFiles().count(f => f.getName.startsWith("part-"))).toMap
  }

  // ~32 MB of barely-compressible rows, heavily skewed across days:
  // day=a holds 80%, b/c 10% each — from 16 upstream partitions
  private def skewed = spark.range(0, 200000, 1, 16)
    .select(
      when(col("id") % 10 < 8, "a").when(col("id") % 10 === 8, "b").otherwise("c").as("day"),
      concat_ws("", (0 until 5).map(i => md5(concat(col("id"), lit(i)))): _*).as("payload"))

  test("uncompacted partitioned write multiplies files; targetFileMB bounds them") {
    val work = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val subs = SourceReader.Substitutions(Map.empty)
    def sink(path: String, target: Option[Int]) = SinkDef(
      input = "in", name = "out", path = path, format = "parquet",
      saveMode = "overwrite", partitionBy = Seq("day"), targetFileMB = target)
    try {
      SinkWriter.write(skewed, sink(s"$work/plain", None), subs)
      SinkWriter.write(skewed, sink(s"$work/compact", Some(4)), subs)
      val plain = fileCounts(s"$work/plain")
      val compact = fileCounts(s"$work/compact")
      // every upstream task held rows of every day → 16 files per dir
      assert(plain.values.forall(_ >= 8), s"expected many small files, got $plain")
      // bin-packed: the hot day splits into ceil(bytes/target) ≈ 8
      // files; each small day is ONE bin, which a hash repartition may
      // merge with others but never split → exactly one file
      assert(compact("day=a") <= 8 && compact("day=a") >= 2, s"got $compact")
      assert(compact("day=b") == 1 && compact("day=c") == 1, s"got $compact")
      val totalPlain = plain.values.sum
      val totalCompact = compact.values.sum
      assert(totalCompact * 2 < totalPlain,
        s"compaction did not reduce file count: $totalCompact vs $totalPlain")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("compacted write of an EMPTY input succeeds (incremental runs with no new data)") {
    val work = java.nio.file.Files.createTempDirectory("graft-compact-empty-").toString
    try {
      SinkWriter.write(
        skewed.filter(org.apache.spark.sql.functions.lit(false)),
        graft.meta.SinkDef("in", "out", s"$work/empty", "parquet", "overwrite",
          Seq("day"), Some(4)),
        SourceReader.Substitutions(Map.empty))
      // the write must complete (pre-fix: NPE on the null bins sum);
      // an empty partitioned write emits no data files to read back
      assert(new java.io.File(s"$work/empty").exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("targetFileMB parses from sink metadata and rejects non-positive values") {
    val meta = Metadata.parse(
      """{"processing_mode": "batch", "dataflows": [{
        |  "name": "f", "sources": [],
        |  "transformations": [],
        |  "sinks": [{"input": "x", "name": "s", "path": "/tmp/x",
        |             "format": "parquet", "targetFileMB": 128,
        |             "partitionBy": ["day"]}]
        |}]}""".stripMargin)
    assert(meta.dataflows.head.sinks.head.targetFileMB.contains(128))
    intercept[graft.meta.MetadataError](Metadata.parse(
      """{"processing_mode": "batch", "dataflows": [{
        |  "name": "f", "sources": [], "transformations": [],
        |  "sinks": [{"input": "x", "name": "s", "path": "/tmp/x",
        |             "targetFileMB": 0}]
        |}]}""".stripMargin))
  }
}
