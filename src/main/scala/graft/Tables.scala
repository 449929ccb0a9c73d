package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view for SQL access. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
