package graft.queries

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Round-17 pins for the corpus-adaptive LSH code width (the round-16
  * verdict's #1 item: q30's fixed 8-plane code measured quadratic at
  * 5M vectors). Three contracts:
  *
  *  1. adaptiveNp is EXACTLY the smallest np in [base, 24] with
  *     N ≤ 500·2^np — pinned at the threshold boundaries on both the
  *     Column form and the generated SQL (evaluated by Spark's SQL
  *     engine here; the DuckDB gate covers the other engine), so the
  *     two can never round apart.
  *  2. The 24-plane code masked to the low 8 bits IS the fixed
  *     8-plane bucket on the real corpus — the committed sub-threshold
  *     oracle rows cannot move.
  *  3. Probe fan-out follows the width: np+1 distinct probes.
  */
class AdaptiveLshSpec extends SparkSpec {

  private def npFor(n: Long, base: Int): Int = {
    import spark.implicits._
    Seq(n).toDF("n")
      .select(VectorQueries.adaptiveNp(col("n"), base).as("np"))
      .head().getInt(0)
  }

  private def npSqlFor(n: Long, base: Int): Int =
    spark.sql(s"SELECT ${VectorQueries.adaptiveNpSql(n.toString, base)} AS np")
      .head().getInt(0)

  test("adaptiveNp: smallest width with expected occupancy <= 500, Column and SQL agree") {
    val cases = Seq(
      // (N, base) -> expected np
      (500L, 8, 8), (128000L, 8, 8), (128001L, 8, 9), (256000L, 8, 9),
      (256001L, 8, 10), (2000000L, 8, 12), (5000000L, 8, 14),
      (500L * (1L << 23), 8, 23), (500L * (1L << 23) + 1, 8, 24),
      (Long.MaxValue / 4, 8, 24), // clamped at maxPlanes
      (2048000L, 12, 12), (2048001L, 12, 13), (5000000L, 12, 14))
    cases.foreach { case (n, base, want) =>
      assert(npFor(n, base) === want, s"adaptiveNp($n, base=$base)")
      assert(npSqlFor(n, base) === want, s"adaptiveNpSql($n, base=$base)")
      // the defining property, not just the table: occupancy bound
      // holds and (above base) the next-narrower width would break it
      val got = npFor(n, base)
      assert(n <= VectorQueries.bucketOccupancyTarget * (1L << got) ||
        got == VectorQueries.maxPlanes,
        s"N=$n at np=$got busts the occupancy target")
      if (got > base)
        assert(n > VectorQueries.bucketOccupancyTarget * (1L << (got - 1)),
          s"np=$got is not minimal for N=$n")
    }
  }

  test("wide code masked to 8 bits equals the fixed 8-plane bucket on the real corpus") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val both = e.select(
      V.lshBucket(col("v"), VectorQueries.planes).as("fixed"),
      V.lshBucket(col("v"), VectorQueries.planesWide)
        .bitwiseAND(lit((1 << 8) - 1)).as("masked"))
    assert(both.filter(col("fixed") =!= col("masked")).isEmpty,
      "masking the 24-plane code does not reproduce the 8-plane bucket")
    // and the wide code genuinely carries more planes: some vector
    // has high bits set (a degenerate all-zero high half would make
    // the adaptive width a silent no-op)
    assert(both.count() > 0)
    val wide = e.select(V.lshBucket(col("v"), VectorQueries.planesWide).as("w"))
    assert(wide.filter(col("w") > lit(255)).count() > 0,
      "no vector uses any plane past the 8th — wide code degenerate")
  }

  test("q29/q30 at sub-threshold scale are bit-identical to the fixed-width implementation") {
    // the pre-round-17 fixed-width forms, reconstructed locally
    val dir = sf()
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
      .withColumn("bucket", V.lshBucket(col("v"), VectorQueries.planes))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("qv"), col("bucket"),
      V.norm(col("v")).as("q_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("nv"), col("bucket"),
      V.norm(col("v")).as("n_nrm"))
    val cos = V.cosineWithNorms(col("qv"), col("nv"), col("q_nrm"), col("n_nrm"))
    val fixed = a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cos.as("cos"))
      .filter(col("cos") > VectorQueries.nearDupThreshold)
      .groupBy(col("b_id"))
      .agg(min(col("a_id")).as("keep_id"), count(lit(1)).as("n_matches"),
        max(col("cos")).as("max_cos"))
      .withColumnRenamed("b_id", "dup_id")
    val adaptive = VectorQueries.q30_embedding_dedup(spark, dir)
    assert(adaptive.exceptAll(fixed).isEmpty && fixed.exceptAll(adaptive).isEmpty,
      "adaptive q30 diverged from the fixed-width form below the threshold")
  }
}
