package graft.queries

import graft.SparkSpec
import graft.multimodal.Multimodal

/** Pins q195's asymmetric containment: a short clip embedded in a
  * longer reel matches at contain_ppm = 10⁶, identical payloads
  * match trivially, and an unrelated payload never pairs.
  */
class MediaDedupSpec extends SparkSpec {

  test("q195: embedded clip, exact duplicate, and an unrelated payload") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mdd").toString
    val ext = Multimodal.frameLen
    def block(c: Char) = c.toString * ext
    // doc 1: reel of 4 extents A B C D; doc 2: clip of 2 extents B C
    // (embedded → contain 10⁶ of the clip); doc 3: identical to doc 2;
    // doc 4: unrelated extents
    val reel = block('a') + block('b') + block('c') + block('d')
    val clip = block('b') + block('c')
    val other = block('x') + block('y')
    Seq((1L, reel), (2L, clip), (3L, clip), (4L, other))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.q195_media_dedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      (1L, 2L) -> ((4L, 2L, 2L, 1000000L)),
      (1L, 3L) -> ((4L, 2L, 2L, 1000000L)),
      (2L, 3L) -> ((2L, 2L, 2L, 1000000L))))
  }
}
