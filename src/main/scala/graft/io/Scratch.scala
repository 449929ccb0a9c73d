package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scratch-directory allocation for queries that stage intermediate
  * tables (versioned lakehouse commits, streaming batch splits,
  * persisted signature/vector indexes).
  *
  * On a cluster, set `spark.graft.scratchDir` to any Hadoop-FS URI
  * (s3a://bucket/tmp, hdfs:///tmp/graft, ...) and every staging query
  * allocates a unique subdirectory there through the Hadoop
  * FileSystem API — nothing touches the driver's local disk. Unset
  * (the local default), it falls back to a java temp dir so
  * local[N] runs need no configuration.
  *
  * Mirrors the reference's bucket-rooted staging layout
  * (utils/json_logger.py:94-139 routes run artifacts under a
  * configured base URI) without binding to any one store.
  */
object Scratch {
  val ConfKey = "spark.graft.scratchDir"

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh, existing directory unique to this call. */
  def dir(spark: SparkSession, prefix: String): String =
    spark.conf.getOption(ConfKey) match {
      case Some(base) =>
        // appId + a process-local counter keeps concurrent sessions
        // and repeated calls from colliding without relying on UUID
        // randomness (deterministic paths ease post-run inspection).
        val unique = s"$prefix${spark.sparkContext.applicationId}-${counter.incrementAndGet()}"
        val p = new Path(base, unique)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(p)
        fs.makeQualified(p).toString
      case None =>
        java.nio.file.Files.createTempDirectory(prefix).toString
    }
}
