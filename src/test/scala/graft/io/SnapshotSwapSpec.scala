package graft.io

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class SnapshotSwapSpec extends SparkSpec {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("promote replaces the snapshot and leaves no tmp/old behind") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("swap").toString
    val dst = new Path(s"$dir/snap")
    val fs = fsFor(dst)
    Seq(1).toDF("v").write.parquet(dst.toString)
    Seq(2).toDF("v").write.parquet(SnapshotSwap.tmpPath(dst).toString)
    SnapshotSwap.promote(fs, dst)
    assert(spark.read.parquet(dst.toString).collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(!fs.exists(SnapshotSwap.tmpPath(dst)))
    assert(!fs.exists(new Path(dst.toString + "_old")))
  }

  test("recover restores a snapshot stranded in _old by a crashed swap") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("swap").toString
    val dst = new Path(s"$dir/snap")
    val fs = fsFor(dst)
    // simulate the crash window: move-aside happened, promote did not
    Seq(7).toDF("v").write.parquet(dst.toString + "_old")
    assert(!fs.exists(dst))
    SnapshotSwap.recover(fs, dst)
    assert(spark.read.parquet(dst.toString).collect().map(_.getInt(0)).toSeq == Seq(7))
    // idempotent when the snapshot is healthy
    SnapshotSwap.recover(fs, dst)
    assert(fs.exists(dst))
  }
}
