package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}

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
  * (graft.operators.Consolidator), i.e. MERGE-ON-READ. DELETEs are
  * tombstone rows ([[tombstoneCol]]) that win the keep-newest order
  * and are folded out by the squash ([[dropTombstones]]) and by
  * compaction — still append-only, still O(delta) per commit. At 100 TB this
  * is the only honest write path: a commit costs O(delta), the
  * commit log is O(versions) driver metadata, and compaction (folding
  * old deltas into a base) is a separate background concern the
  * format already supports — a compacted base is just a new table.
  */
object Versioned {

  /** Column marking a row as a DELETE tombstone. Commits are still
    * append-only — a delete is a new row that WINS the table's
    * keep-newest order for its key and carries `_deleted = true`; the
    * reader-side squash (keep-newest dedup, then [[dropTombstones]])
    * and [[compact]]'s base fold both erase the key. Deltas without
    * the column are plain inserts/updates (reads surface it as NULL =
    * not deleted via mergeSchema — the q97 schema-evolution read
    * applied to the commit log).
    */
  val tombstoneCol = "_deleted"

  /** Mark every row of `df` as a delete tombstone for its key. The
    * row must carry the key and a winning position in the table's
    * keep-newest order (orderBy/tieBreaker) — a tombstone that LOSES
    * the order is correctly ignored, exactly like a stale update.
    */
  def tombstones(df: DataFrame): DataFrame =
    df.withColumn(tombstoneCol, lit(true))

  /** The merge-on-read DELETE: applied AFTER the keep-newest squash,
    * drops every key whose winning row is a tombstone. No-op on
    * tables that never carried deletes. NULL (rows from pre-tombstone
    * deltas under a merged schema) means not deleted.
    */
  def dropTombstones(df: DataFrame): DataFrame =
    if (df.columns.contains(tombstoneCol))
      df.filter(not(coalesce(col(tombstoneCol), lit(false)))).drop(tombstoneCol)
    else df

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerDir(table: String) = new Path(table, "_commits")

  private def deltaDir(table: String, v: Int) =
    new Path(table, f"delta-$v%05d")

  /** One committed version: `base = true` means this delta FOLDS all
    * earlier history (a compaction checkpoint) — readers at or after
    * it start from this delta instead of replaying from version 1.
    */
  final case class Commit(version: Int, base: Boolean)

  /** Committed versions with their base flags, ascending — from
    * markers only.
    */
  def commits(spark: SparkSession, table: String): Seq[Commit] = {
    val dir = markerDir(table)
    val filesystem = fs(spark, dir)
    if (!filesystem.exists(dir)) Seq.empty
    else filesystem.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map { name =>
        val in = filesystem.open(new Path(dir, name))
        val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        Commit(name.stripSuffix(".json").toInt, json.contains(""""base":true"""))
      }
      .sortBy(_.version)
  }

  /** Committed version numbers, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Int] =
    commits(spark, table).map(_.version)

  private def publish(spark: SparkSession, table: String, df: DataFrame,
      base: Boolean): Int = {
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
    val json = s"""{"version":$v,"dir":"${data.getName}","base":$base}"""
    val out = filesystem.create(marker, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  /** Append `df` as the next version's delta and publish its marker.
    * Returns the committed version number.
    */
  def commit(spark: SparkSession, table: String, df: DataFrame): Int =
    publish(spark, table, df, base = false)

  /** Compaction: fold the CURRENT state (per `squash`, e.g. the
    * reader's keep-newest dedup) into one new BASE version. As-of
    * reads at or beyond it replay from the base instead of from
    * version 1 — read cost stops growing with history — while reads
    * BEFORE it still see the original deltas: compaction never
    * rewrites or deletes published versions, so time travel survives
    * it. Same crash safety as commit (data first, marker last).
    * At 100 TB this is the background job that keeps merge-on-read
    * amortized; old deltas become retention policy, not correctness.
    */
  def compact(spark: SparkSession, table: String,
      squash: DataFrame => DataFrame): Int = {
    val head = versions(spark, table).lastOption.getOrElse(
      throw new IllegalArgumentException(s"nothing to compact under $table"))
    publish(spark, table, squash(readAsOf(spark, table, head)), base = true)
  }

  /** The log-structured rows of the table AS OF `version`: the most
    * recent base ≤ version (if any) plus every later delta ≤ version.
    * Orphan data directories without a marker are invisible. Squash
    * to current-state with a keep-newest dedup (merge-on-read) if the
    * table has a key.
    */
  /** The rows of exactly ONE committed version — its delta directory
    * alone, nothing replayed. This is what makes an O(delta) change
    * feed possible (ChangeCapture.q115): consumers diff the delta
    * against prior state instead of materializing two full snapshots.
    */
  def readDelta(spark: SparkSession, table: String, version: Int): DataFrame = {
    require(commits(spark, table).exists(_.version == version),
      s"version $version is not committed under $table")
    spark.read.parquet(deltaDir(table, version).toString)
  }

  def readAsOf(spark: SparkSession, table: String, version: Int): DataFrame = {
    val all = commits(spark, table).filter(_.version <= version)
    require(all.nonEmpty, s"no committed version <= $version under $table")
    val fromBase = all.lastIndexWhere(_.base) match {
      case -1 => all
      case i  => all.drop(i)
    }
    // one multi-path scan, not a union of plans: file-source scans all
    // delta dirs in a single FileScan with partition-count parallelism.
    // mergeSchema because deltas may evolve the schema (tombstone
    // commits carry _deleted and may omit payload columns; the q97
    // rule) — absent columns surface as NULL on the older rows
    spark.read.option("mergeSchema", "true")
      .parquet(fromBase.map(c => deltaDir(table, c.version).toString): _*)
  }
}
