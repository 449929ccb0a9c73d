package graft.io

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Commit-log semantics: versions resolve from markers alone, commits
  * are append-only, as-of reads see exactly the committed prefix.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("as-of reads see exactly the committed prefix of history") {
    val work = java.nio.file.Files.createTempDirectory("graft-versioned-").toString
    try {
      val t = s"$work/t"
      assert(Versioned.versions(spark, t) === Seq.empty)
      assert(Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "v")) === 1)
      assert(Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "v")) === 2)
      assert(Versioned.commit(spark, t, Seq((1L, "c")).toDF("id", "v")) === 3)
      assert(Versioned.versions(spark, t) === Seq(1, 2, 3))
      def rows(v: Int) = Versioned.readAsOf(spark, t, v)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows(1) === Set((1L, "a")))
      assert(rows(2) === Set((1L, "a"), (2L, "b")))
      assert(rows(3) === Set((1L, "a"), (2L, "b"), (1L, "c"))) // log-structured: both key-1 rows
      // as-of beyond head = head (markers <= version)
      assert(rows(99) === rows(3))
      intercept[IllegalArgumentException](Versioned.readAsOf(spark, t, 0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("an orphan data directory without a marker is invisible (crash between data and marker)") {
    val work = java.nio.file.Files.createTempDirectory("graft-versioned-").toString
    try {
      val t = s"$work/t"
      Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "v"))
      // simulate a crash: delta dir lands, marker never does
      Seq((9L, "ghost")).toDF("id", "v").write.parquet(s"$t/delta-00002")
      assert(Versioned.versions(spark, t) === Seq(1))
      assert(Versioned.readAsOf(spark, t, 99).count() === 1L)
      // the next commit vacuums the orphan instead of wedging the table
      assert(Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "v")) === 2)
      assert(Versioned.readAsOf(spark, t, 2)
        .collect().map(_.getString(1)).toSet === Set("a", "b")) // ghost gone
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("compaction folds history going forward but never rewrites time travel") {
    val work = java.nio.file.Files.createTempDirectory("graft-versioned-").toString
    try {
      val t = s"$work/t"
      // key-value rows; squash = keep the lexicographically-last value per key
      Versioned.commit(spark, t, Seq((1L, "a1"), (2L, "b1")).toDF("id", "v"))
      Versioned.commit(spark, t, Seq((1L, "a2")).toDF("id", "v"))
      def squash(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("id").agg(org.apache.spark.sql.functions.max("v").as("v"))
      val baseV = Versioned.compact(spark, t, squash)
      assert(baseV === 3)
      Versioned.commit(spark, t, Seq((3L, "c1")).toDF("id", "v"))

      def state(v: Int) = squash(Versioned.readAsOf(spark, t, v))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // current state is identical through the base
      assert(state(4) === Set((1L, "a2"), (2L, "b1"), (3L, "c1")))
      // post-base reads replay from the base only: 2 delta dirs, not 4
      val dirs = Versioned.readAsOf(spark, t, 4).inputFiles
        .map(f => f.split("/").takeRight(2).head).toSet
      assert(dirs === Set("delta-00003", "delta-00004"), s"history not folded: $dirs")
      // time travel BEFORE the base still sees the original log
      assert(state(1) === Set((1L, "a1"), (2L, "b1")))
      assert(Versioned.readAsOf(spark, t, 2).count() === 3) // log-structured rows
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("a delete round-trips: tombstone commit -> squashed as-of read -> compaction") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft-versioned-").toString
    try {
      val t = s"$work/t"
      // (id, seq, v): keep-newest by seq per id
      Versioned.commit(spark, t, Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("id", "seq", "v"))
      Versioned.commit(spark, t, Seq((1L, 2L, "a2")).toDF("id", "seq", "v"))
      // version 3 deletes key 1: a tombstone that WINS the seq order
      val v3 = Versioned.commit(spark, t, Versioned.tombstones(
        Seq((1L, 3L, null.asInstanceOf[String])).toDF("id", "seq", "v")))
      def squash(df: org.apache.spark.sql.DataFrame) = Versioned.dropTombstones(
        graft.operators.Dedup.keepNewest(df, col("id"), col("seq"), col("seq")))
      def state(ver: Int) = squash(Versioned.readAsOf(spark, t, ver))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      // before the delete: both keys; as of the delete: key 1 gone
      assert(state(2) === Set((1L, "a2"), (2L, "b1")))
      assert(state(v3) === Set((2L, "b1")))
      // pre-tombstone deltas lack _deleted; the merged-schema read
      // surfaces NULL there and dropTombstones treats it as live
      val merged = Versioned.readAsOf(spark, t, v3)
      assert(merged.columns.contains(Versioned.tombstoneCol))
      assert(merged.filter(col(Versioned.tombstoneCol).isNull).count() === 3L)

      // compaction folds the delete out of the base entirely...
      val baseV = Versioned.compact(spark, t, squash)
      assert(state(baseV) === Set((2L, "b1")))
      val baseRows = Versioned.readDelta(spark, t, baseV).collect()
      assert(baseRows.length === 1 && baseRows.head.getLong(0) === 2L,
        "the base must not carry the erased key or its tombstone")
      // ...while time travel before the tombstone still sees key 1
      assert(state(2) === Set((1L, "a2"), (2L, "b1")))
      // a tombstone that LOSES the keep-newest order changes nothing
      Versioned.commit(spark, t, Versioned.tombstones(
        Seq((2L, 0L, null.asInstanceOf[String])).toDF("id", "seq", "v")))
      assert(state(baseV + 1) === Set((2L, "b1")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("commits never touch earlier versions' files (append-only)") {
    val work = java.nio.file.Files.createTempDirectory("graft-versioned-").toString
    try {
      val t = s"$work/t"
      Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "v"))
      val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
      def v1Files = fs.listStatus(new Path(s"$t/delta-00001")).toSeq
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).sortBy(_._1)
      val before = v1Files
      Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "v"))
      assert(v1Files === before, "version-1 files changed on a later commit")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }
}
