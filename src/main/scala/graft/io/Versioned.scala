package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table with a commit log and merge-on-read deltas — the
  * time-travel primitive the lakehouse formats provide, expressed
  * directly over parquet + a tiny JSON log.
  *
  * Layout under one table root:
  * {{{
  *   delta-00001/ ... parquet      (the rows committed at version 1)
  *   delta-00002/ ...
  *   _commits/00001.json           {"version":1,"dir":"delta-00001"}
  *   _commits/00002.json
  * }}}
  *
  * A commit APPENDS one delta directory and then writes its marker;
  * nothing ever rewrites an earlier version's files. Readers resolve
  * a version from markers alone, so a crash between data-write and
  * marker-write leaves an invisible orphan directory, never a torn
  * table (the snapshot-swap rule graft.io.SnapshotSwap applies to
  * overwrites, applied here to appends). Version N *as of* = the
  * union of delta dirs 1..N — log-structured rows; squashing them to
  * current-state is the reader's keep-newest dedup
  * (graft.operators.Consolidator), i.e. MERGE-ON-READ. At 100 TB this
  * is the only honest write path: a commit costs O(delta), the
  * commit log is O(versions) driver metadata, and compaction (folding
  * old deltas into a base) is a separate background concern the
  * format already supports — a compacted base is just a new table.
  */
object Versioned {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerDir(table: String) = new Path(table, "_commits")

  private def deltaDir(table: String, v: Int) =
    new Path(table, f"delta-$v%05d")

  /** Committed versions, ascending — from markers only. */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = markerDir(table)
    val filesystem = fs(spark, dir)
    if (!filesystem.exists(dir)) Seq.empty
    else filesystem.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt)
      .sorted
  }

  /** Append `df` as the next version's delta and publish its marker.
    * Returns the committed version number.
    */
  def commit(spark: SparkSession, table: String, df: DataFrame): Int = {
    val v = versions(spark, table).lastOption.getOrElse(0) + 1
    val data = deltaDir(table, v)
    val filesystemData = fs(spark, data)
    // a data dir at this version with NO marker is a crashed commit's
    // orphan — invisible to every reader by construction, so vacuum it
    // rather than wedging the table
    if (filesystemData.exists(data)) filesystemData.delete(data, true)
    df.write.mode("errorifexists").parquet(data.toString)
    val marker = new Path(markerDir(table), f"$v%05d.json")
    val filesystem = fs(spark, marker)
    val json = s"""{"version":$v,"dir":"${data.getName}"}"""
    val out = filesystem.create(marker, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  /** The log-structured rows of the table AS OF `version`: the union
    * of every committed delta ≤ version. Orphan data directories
    * without a marker are invisible. Squash to current-state with a
    * keep-newest dedup (merge-on-read) if the table has a key.
    */
  def readAsOf(spark: SparkSession, table: String, version: Int): DataFrame = {
    val vs = versions(spark, table).filter(_ <= version)
    require(vs.nonEmpty, s"no committed version <= $version under $table")
    // one multi-path scan, not a union of plans: file-source scans all
    // delta dirs in a single FileScan with partition-count parallelism
    spark.read.parquet(vs.map(v => deltaDir(table, v).toString): _*)
  }
}
