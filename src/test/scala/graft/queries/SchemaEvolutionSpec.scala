package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q97's mechanics beyond the transparent oracle: the merged read
  * must surface the evolved column as NULL for old-generation rows
  * (not drop the rows, not drop the column, not invent a default).
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema read surfaces the missing column as NULL for old batches") {
    val work = java.nio.file.Files.createTempDirectory("graft-q97spec-").toString
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val docs = graft.Tables.load(spark, sf(), "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "source", "n_chars")
        .write.parquet(s"$work/in/batch=b0")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select("doc_id", "source", "n_chars", "lang")
        .write.parquet(s"$work/in/batch=b1")
      val merged = spark.read.option("mergeSchema", "true").parquet(s"$work/in")
      assert(merged.schema.fieldNames.contains("lang"))
      // every old-generation row reads NULL; every new one keeps its value
      assert(merged.filter(col("batch") === "b0" && col("lang").isNotNull).count() == 0)
      assert(merged.filter(col("batch") === "b1" && col("lang").isNull).count() == 0)
      // no rows lost across the generations
      assert(merged.count() == docs.count())
    } finally fs.delete(new Path(work), true)
  }

  test("q97 output: b0 groups are all 'unknown', b1 groups never are") {
    val out = PipelineQueries.q97_schema_evolution(spark, sf()).collect()
    assert(out.nonEmpty)
    assert(out.filter(_.getString(0) == "b0").forall(_.getString(2) == "unknown"))
    // the corpus has no literal 'unknown' lang, so one appearing under
    // b1 would mean a new-generation row lost its value in the merge
    assert(out.filter(_.getString(0) == "b1").forall(_.getString(2) != "unknown"))
  }
}
