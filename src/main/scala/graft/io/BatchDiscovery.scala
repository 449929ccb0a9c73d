package graft.io

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Batch discovery + incremental filtering
  * (reference pipeline/runner.py:discover_batches / filter_new_batches).
  *
  * Lists `prefix<date>` directories under a base path on any Hadoop
  * filesystem, keeps only names that parse as dates, and filters to
  * batches strictly newer than the manifest watermark — re-delivered
  * batches are rejected, which is what makes re-runs idempotent.
  */
object BatchDiscovery {

  private val isoDate = DateTimeFormatter.ISO_LOCAL_DATE

  def discover(spark: SparkSession, baseDir: String, prefix: String): Seq[String] = {
    val base = new Path(baseDir)
    val filesystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!filesystem.exists(base)) Seq.empty
    else filesystem.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix))
      .filter(isDate)
      .sorted
  }

  private def isDate(s: String): Boolean =
    try { LocalDate.parse(s, isoDate); true } catch { case _: Exception => false }

  /** Batches strictly after the watermark; `None` watermark = all. */
  def filterNew(all: Seq[String], lastProcessed: Option[String]): Seq[String] =
    lastProcessed match {
      case None       => all
      case Some(last) => all.filter(_ > last)
    }
}
