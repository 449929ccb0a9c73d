package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loads the driver-generated testdata tables (see TESTDATA.md).
  *
  * All tables are plain parquet files under a scale-factor directory.
  * At cluster scale the same code reads any Hadoop-FS path (s3a/gs/hdfs);
  * nothing here is local-filesystem specific.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read nanos as long and floor-
      // divide to micros — the same truncation DuckDB applies when it
      // loads nanosecond parquet into its microsecond TIMESTAMP.
      // The conf is consulted only during eager schema inference in
      // load(), so it can be restored immediately after — later reads
      // in the same session keep their own semantics.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try
        spark.read.parquet(s"$dir/$name.parquet")
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view for SQL access. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
