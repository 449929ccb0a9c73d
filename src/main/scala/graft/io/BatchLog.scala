package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replay-safe micro-batch delta log — the write discipline the
  * streamed index-maintenance family (q309/q316/q317/q318/q320/q321/
  * q325) needs under `foreachBatch`'s AT-LEAST-ONCE contract.
  *
  * `foreachBatch` can re-deliver a micro-batch: a batch whose side
  * effect committed but whose checkpoint offset did not is re-run on
  * restart. A blind `mode("append")` therefore DOUBLE-appends on
  * replay — for an additive count log that silently double-counts;
  * for postings it duplicates candidates and shifts top-k ranks. The
  * fix is determinism, not transactions: every batch writes to a
  * batchId-DETERMINISTIC directory with overwrite semantics, so a
  * replay rewrites the identical bytes instead of adding new ones —
  * exactly-once EFFECT from at-least-once delivery (the standard
  * idempotent-sink recipe from the Structured Streaming docs).
  *
  * Layout under one log root:
  * {{{
  *   gen-00000/batch=-1/...parquet   (optional pre-stream base)
  *   gen-00000/batch=0/...parquet    (micro-batch 0's delta)
  *   gen-00000/batch=1/...
  *   gen-00001/batch=-1/...          (a FOLD: merged generation)
  *   _gen/00001.json                 {"version":1,"absorbedThrough":1}
  * }}}
  *
  * Generations serve in-place compaction (q325's LSM loop): a fold
  * materializes the merged log as generation N+1 and PUBLISHES it by
  * creating a marker — [[Versioned]]'s crash rule applied to
  * compaction. A crash after the data write but before the marker
  * leaves an invisible orphan the next fold vacuums; there is never a
  * moment with NO log at the root (the delete-then-rename swap this
  * replaces had exactly that window). The marker also records the
  * highest batchId the fold absorbed, closing the second replay hole:
  * a batch appended to generation N, folded into N+1, then
  * re-delivered after restart must NOT re-append to N+1 —
  * [[append]] drops any batchId at or below the current generation's
  * `absorbedThrough`.
  *
  * Scale shape: a batch append is one bounded delta write, a read is
  * one partitioned-directory scan of the CURRENT generation only, a
  * fold is one log-sized rewrite — O(delta) per commit, exactly the
  * LSM cost model, now crash- and replay-safe.
  */
object BatchLog {

  /** The generation readers and writers currently resolve: version 0
    * is implicit (no marker); `absorbedThrough` is the highest
    * batchId already folded into this generation's base — appends at
    * or below it are replays of absorbed batches and must be dropped.
    */
  final case class Gen(version: Int, absorbedThrough: Long)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerDir(root: String) = new Path(root, "_gen")

  private def genDir(root: String, v: Int) = new Path(root, f"gen-$v%05d")

  /** Resolve the current generation from markers alone ([[Versioned]]'s
    * reader rule): data directories without a marker are invisible.
    */
  def current(spark: SparkSession, root: String): Gen = {
    val dir = markerDir(root)
    val filesystem = fs(spark, dir)
    if (!filesystem.exists(dir)) Gen(0, Long.MinValue)
    else filesystem.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map { name =>
        val in = filesystem.open(new Path(dir, name))
        val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        Gen(name.stripSuffix(".json").toInt,
          "\"absorbedThrough\":(-?\\d+)".r.findFirstMatchIn(json)
            .map(_.group(1).toLong).getOrElse(Long.MinValue))
      }
      .sortBy(_.version).lastOption.getOrElse(Gen(0, Long.MinValue))
  }

  /** Idempotent micro-batch append: overwrite the batchId-keyed
    * directory of the CURRENT generation. Replay of an unabsorbed
    * batch rewrites identical bytes; replay of a batch a later fold
    * already absorbed is a no-op.
    */
  def append(df: DataFrame, root: String, batchId: Long): Unit = {
    val g = current(df.sparkSession, root)
    if (batchId > g.absorbedThrough)
      df.write.mode("overwrite")
        .parquet(new Path(genDir(root, g.version), s"batch=$batchId").toString)
  }

  /** Pre-stream base artifact (full index built before the feed
    * starts) — just batch -1 of generation 0.
    */
  def base(df: DataFrame, root: String): Unit = append(df, root, -1L)

  /** The current generation's rows — batch directories surface as a
    * discovered partition column, dropped here so readers see the
    * delta schema unchanged.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(genDir(root, current(spark, root).version).toString)
      .drop("batch")

  /** Highest batchId physically present in the current generation
    * (what a fold publishes as its `absorbedThrough`).
    */
  private def maxBatchId(spark: SparkSession, root: String, g: Gen): Long = {
    val dir = genDir(root, g.version)
    val filesystem = fs(spark, dir)
    val present =
      if (!filesystem.exists(dir)) Seq.empty
      else filesystem.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
    (present :+ g.absorbedThrough).max
  }

  /** Fold the current generation into the next: materialize
    * `merge(read)` as generation N+1's base, then publish it by
    * creating the marker — write-then-publish, never
    * delete-then-rename. Crash before the marker: generation N stays
    * current and the orphan data is vacuumed on the next fold
    * attempt. Crash after: the marker's `absorbedThrough` makes every
    * replayed pre-fold batch a no-op in [[append]].
    */
  def fold(spark: SparkSession, root: String)
      (merge: DataFrame => DataFrame): Unit = {
    val g = current(spark, root)
    val absorbed = maxBatchId(spark, root, g)
    val next = g.version + 1
    val dest = genDir(root, next)
    val filesystem = fs(spark, dest)
    // a data dir at this version with no marker is a crashed fold's
    // orphan — invisible to every reader by construction, so vacuum it
    if (filesystem.exists(dest)) filesystem.delete(dest, true)
    merge(read(spark, root)).write.mode("errorifexists")
      .parquet(new Path(dest, "batch=-1").toString)
    val marker = new Path(markerDir(root), f"$next%05d.json")
    val out = fs(spark, marker).create(marker, false)
    try out.write(
      s"""{"version":$next,"absorbedThrough":$absorbed}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
