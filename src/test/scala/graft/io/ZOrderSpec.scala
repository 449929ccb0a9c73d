package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton code must match an independent
  * bit-interleave reference, and — the point of the layout — a band
  * predicate on the SECOND clustered dimension must skip files that a
  * single-column range clustering of the same data cannot skip.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: interleave bit i of dimension j to
    * position i*k + j, written as the naive loop.
    */
  private def mortonRef(vals: Seq[Long]): Long = {
    val k = vals.size
    var z = 0L
    for (i <- 0 until Layout.zBits; j <- 0 until k)
      z |= ((vals(j) >> i) & 1L) << (i * k + j)
    z
  }

  test("zCode matches the reference interleave on random 16-bit pairs and triples") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got2 = pairs.toDF("a", "b")
      .select(Layout.zCode(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 === pairs.map(p => mortonRef(Seq(p._1, p._2))))

    val triples = Seq.fill(100)(
      (rng.nextInt(65536).toLong, rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got3 = triples.toDF("a", "b", "c")
      .select(Layout.zCode(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got3 === triples.map(t => mortonRef(Seq(t._1, t._2, t._3))))
  }

  private def filesIntersecting(path: String, column: String, lo: Long, hi: Long): (Int, Int) = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(column)).cast("long"), max(col(column)).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    (ranges.count { case (mn, mx) => mx >= lo && mn < hi }, files.size)
  }

  test("z-order prunes the second dimension where single-column clustering cannot") {
    val work = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    try {
      val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
        .select("doc_id", "source", "n_chars")
      Layout.writeZOrdered(docs, s"$work/z", 16, "doc_id", "n_chars")
      Layout.writeRangeClustered(docs, s"$work/r", 16, "doc_id")

      // row parity: the layout is a permutation, never a filter
      assert(spark.read.parquet(s"$work/z").count() === docs.count())

      // an n_chars band: invisible to doc_id clustering, visible to z-order
      val (zHit, zTotal) = filesIntersecting(s"$work/z", "n_chars", 150, 300)
      val (rHit, rTotal) = filesIntersecting(s"$work/r", "n_chars", 150, 300)
      assert(zTotal >= 8 && rTotal >= 8, s"want real file counts, got $zTotal/$rTotal")
      assert(rHit === rTotal, s"doc_id clustering should scatter n_chars everywhere ($rHit/$rTotal)")
      assert(zHit < rHit, s"z-order should skip n_chars files: z=$zHit/$zTotal vs r=$rHit/$rTotal")

      // and the leading dimension still prunes under z-order too
      val (zDoc, _) = filesIntersecting(s"$work/z", "doc_id", 100, 200)
      assert(zDoc < zTotal, s"z-order should also skip doc_id files ($zDoc/$zTotal)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("empty input and all-NULL columns fail fast; per-row NULLs bucket at the min cell") {
    val work = java.nio.file.Files.createTempDirectory("graft-znull-").toString
    try {
      val empty = Seq.empty[(Long, Long)].toDF("a", "b")
      val e1 = intercept[IllegalArgumentException] {
        Layout.writeZOrdered(empty, s"$work/e", 4, "a", "b")
      }
      assert(e1.getMessage.contains("empty input or all-NULL"))

      val allNull = (0L until 8L).map(i => (i, null.asInstanceOf[java.lang.Long]))
        .toDF("a", "b")
      val e2 = intercept[IllegalArgumentException] {
        Layout.writeZOrdered(allNull, s"$work/n", 4, "a", "b")
      }
      assert(e2.getMessage.contains("'b'"))

      // per-row NULL keys survive the layout (bucketed at the min cell)
      // instead of collapsing into one NULL-code partition
      val some = (0L until 64L)
        .map(i => (i, if (i % 8 == 0) null.asInstanceOf[java.lang.Long]
                      else java.lang.Long.valueOf(i * 3)))
        .toDF("a", "b")
      Layout.writeZOrdered(some, s"$work/s", 4, "a", "b")
      val back = spark.read.parquet(s"$work/s")
      assert(back.count() === 64L)
      assert(back.filter(col("b").isNull).count() === 8L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("degenerate dimension (constant column) still lays out and answers correctly") {
    val df = (0L until 64L).map(i => (i, 42L)).toDF("a", "b")
    val work = java.nio.file.Files.createTempDirectory("graft-zconst-").toString
    try {
      Layout.writeZOrdered(df, s"$work/z", 4, "a", "b")
      val back = spark.read.parquet(s"$work/z")
      assert(back.count() === 64L)
      assert(back.agg(sum("a")).head().getLong(0) === (0L until 64L).sum)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }
}
