package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ScratchSpec extends SparkSpec {

  test("default (no conf key): allocates a local java temp dir") {
    assert(spark.conf.getOption(Scratch.ConfKey).isEmpty)
    val d = Scratch.dir(spark, "graft-scratch-spec-")
    assert(Files.isDirectory(Paths.get(d)))
    assert(Paths.get(d).getFileName.toString.startsWith("graft-scratch-spec-"))
  }

  test("conf key set: allocates unique subdirs under the configured base") {
    val base = Files.createTempDirectory("graft-scratch-base-").toString
    spark.conf.set(Scratch.ConfKey, base)
    try {
      val a = Scratch.dir(spark, "q-")
      val b = Scratch.dir(spark, "q-")
      assert(a !== b)
      for (d <- Seq(a, b)) {
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(fs.getFileStatus(p).isDirectory)
        assert(d.contains(base), s"$d should live under $base")
      }
      // A staged write through the allocated path round-trips.
      import spark.implicits._
      val out = s"$a/t.parquet"
      Seq(1, 2, 3).toDF("x").write.parquet(out)
      assert(spark.read.parquet(out).count() === 3)
    } finally spark.conf.unset(Scratch.ConfKey)
  }
}
