package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-clustered writes must give each output file a disjoint key
  * range — the property every stats-based file/row-group pruner needs.
  */
class LayoutSpec extends SparkSpec {

  private def fileRanges(path: String): Seq[(Long, Long)] = {
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id")).head()
        (r.getLong(0), r.getLong(1))
      }
  }

  test("range-clustered files have pairwise disjoint key ranges; plain writes overlap") {
    val work = java.nio.file.Files.createTempDirectory("graft-layout-").toString
    try {
      val events = graft.Tables.load(spark, sf(), "events")
        .select("event_id", "user_id", "value")
      Layout.writeRangeClustered(events, s"$work/clustered", 4, "user_id")
      val ranges = fileRanges(s"$work/clustered").sorted
      assert(ranges.size >= 2, s"expected multiple files, got $ranges")
      ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping file ranges: $ranges")
      }
      // the contrast: a plain round-robin write spreads every range
      // over every file — nothing can be skipped
      events.repartition(4).write.parquet(s"$work/plain")
      val plain = fileRanges(s"$work/plain").sorted
      assert(plain.size >= 2, s"expected multiple plain files, got $plain")
      assert(plain.sliding(2).exists { case Seq((_, hi), (lo, _)) => hi > lo },
        s"expected overlapping ranges in the unclustered layout: $plain")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }
}
