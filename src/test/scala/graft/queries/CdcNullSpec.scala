package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q85's change detection must be NULL-safe: a tracked column going
  * NULL→value or value→NULL is a real update, but `=!=` evaluates to
  * NULL there and silently drops the row. The documents/orders corpora
  * carry no NULLs in tracked columns (so the oracle can't catch this);
  * this fixture does.
  */
class CdcNullSpec extends SparkSpec {

  private val schemaOld = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("old_id", LongType, nullable = true),
    StructField("old_val", StringType, nullable = true)))
  private val schemaNew = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("new_id", LongType, nullable = true),
    StructField("new_val", StringType, nullable = true)))

  private def mk(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  test("NULL transitions in tracked columns emit update; NULL==NULL does not") {
    val v1 = mk(schemaOld, Seq(
      Row(1L, 10L, null),      // NULL -> "x"  : update
      Row(2L, 20L, "y"),       // "y"  -> NULL : update
      Row(3L, 30L, null),      // NULL -> NULL : unchanged
      Row(4L, 40L, "z"),       // unchanged
      Row(5L, 50L, "gone")))   // delete
    val v2 = mk(schemaNew, Seq(
      Row(1L, 10L, "x"),
      Row(2L, 20L, null),
      Row(3L, 30L, null),
      Row(4L, 40L, "z"),
      Row(6L, 60L, "born")))   // insert
    val out = ChangeCapture.snapshotDiff(v1, v2, "k", "old_id", "new_id",
      Seq("old_id" -> "new_id", "old_val" -> "new_val"))
      .select("k", "op").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "update", 2L -> "update",
      5L -> "delete", 6L -> "insert"),
      s"got $out — NULL transitions must surface as updates, NULL==NULL must not")
  }
}
