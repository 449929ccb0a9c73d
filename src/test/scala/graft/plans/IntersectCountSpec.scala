package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native intersect_count must equal size(array_intersect(a, b))
  * exactly — the DuckDB oracles keep speaking len(list_intersect),
  * so this equality is what keeps the Jaccard/containment oracle
  * surface valid.
  */
class IntersectCountSpec extends SparkSpec {

  test("native == size(array_intersect) on corpus shingle-key pairs") {
    val base = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"),
        array_distinct(graft.functions.HashFunctions.shingleKeys(
          call_function("shingles3", col("text")))).as("sk"))
      .filter(size(col("sk")) > 0)
    val pairs = base.select(col("doc_id").as("a_id"), col("sk").as("a_sk"))
      .crossJoin(base.select(col("doc_id").as("b_id"), col("sk").as("b_sk")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs
      .select(
        call_function("intersect_count", col("a_sk"), col("b_sk")).as("native"),
        size(array_intersect(col("a_sk"), col("b_sk"))).as("decl"))
      .filter(!(col("native") <=> col("decl")))
      .count()
    assert(diff == 0)
  }

  test("native == size(array_intersect) on edge fixtures") {
    import spark.implicits._
    val fixtures: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // plain overlap
      (Seq.empty, Seq(1L)),                        // empty a
      (Seq(1L), Seq.empty),                        // empty b
      (Seq(1L, 1L, 2L, 2L), Seq(2L, 1L, 1L)),      // duplicates: distinct count
      (Seq(5L, null, 7L), Seq(null, 5L)),          // null in both: counts once
      (Seq(null, null), Seq(null)),                // only nulls
      (Seq(1L, null), Seq(1L)),                    // null only on one side
      (Seq(Long.MinValue, Long.MaxValue, 0L),
        Seq(0L, Long.MinValue, Long.MaxValue)),    // extremes
      (Seq(-1L, -2L), Seq(1L, 2L)))                // disjoint
    val df = fixtures.toDF("a", "b")
    val out = df.select(
        call_function("intersect_count", col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("decl"))
      .collect()
    out.foreach { r =>
      assert(r.get(0) == r.get(1), s"native=${r.get(0)} decl=${r.get(1)}")
    }
    // null ARRAY inputs: both forms are null under ANSI size()
    val nullCase = Seq((null: Seq[java.lang.Long], Seq[java.lang.Long](1L)))
      .toDF("a", "b")
      .select(
        call_function("intersect_count", col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("decl"))
      .collect().head
    assert(nullCase.isNullAt(0) == nullCase.isNullAt(1))
  }
}
