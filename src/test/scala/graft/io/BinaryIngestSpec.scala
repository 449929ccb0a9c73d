package graft.io

import graft.SparkSpec
import graft.meta.SourceDef
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Raw-file multimodal ingestion through the metadata-driven source
  * layer: a `binaryFile`-format SourceDef (Spark's built-in raw-file
  * reader — path/length/content columns, no media lib needed) must
  * flow into the q31 media-table shape and through the partition-level
  * decode path unchanged. This is the ingestion edge of the multimodal
  * family: parquet-borne payload columns (q31/q89) ingest like any
  * table; THIS pins the directory-of-raw-files case.
  */
class BinaryIngestSpec extends SparkSpec {

  test("binaryFile SourceDef -> media shape -> partition decode") {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    val payloads = Map(
      "a.img" -> "fake-image-bytes-A",
      "b.img" -> "fake-image-payload-BB",
      "c.img" -> "x")
    payloads.foreach { case (name, content) =>
      java.nio.file.Files.write(dir.resolve(name), content.getBytes("UTF-8"))
    }

    val src = SourceDef(
      name = "raw_images", path = s"$dir/*.img", format = "binaryFile",
      required = true, schema = None, schemaEnforced = false,
      options = Map.empty)
    val raw = SourceReader.read(spark, src, SourceReader.Substitutions(Map.empty))
    assert(raw.columns.toSet === Set("path", "modificationTime", "length", "content"))

    // media-table shape: stable doc_id from the file name, payload from
    // the raw bytes, mime in the typed metadata struct
    val media = raw.select(
      xxhash64(regexp_extract(col("path"), "([^/]+)$", 1)).as("doc_id"),
      col("content").as("payload"),
      struct(lit("image/fake").as("mime"),
        col("path").as("origin"),
        col("length").as("declared_size")).as("media_meta"))
    val decoded = Multimodal.decodeImages(spark, media).collect()

    assert(decoded.length === payloads.size)
    // every decode must equal the stub applied to the original bytes —
    // proves content bytes survive the source layer untouched
    val byLen = decoded.map(d => d.n_bytes -> d).toMap
    payloads.values.foreach { content =>
      val bytes = content.getBytes("UTF-8")
      val (w, h, f0) = Multimodal.StubDecoders.decodeImage(bytes)
      val d = byLen(bytes.length)
      assert((d.width, d.height, d.feature0) === ((w, h, f0)))
    }
  }
}
