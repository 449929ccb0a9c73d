package graft.queries

import graft.SparkSpec

/** Pins for q166 (hand-computed log2 buckets), q167 (flag invariants +
  * internal-consistency recount), q168 (hand-traced churn labels incl.
  * skip-week churn and the unlabelable last week), q169 (identical
  * sources overlap exactly 10⁶; disjoint sources emit no row), and
  * q170 (dominant-head vs uniform-vocabulary extremes).
  */
class OpsProfileSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q166: hand-computed bit-length buckets over a known key distribution") {
    import spark.implicits._
    val dir = tmp("skew")
    // o_custkey counts: 1 → 1 row, 2 → 1, 3 → 2, 4 → 4
    Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 3L),
      (14L, 4L), (15L, 4L), (16L, 4L), (17L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // q166 also profiles lineitem; give it one row so the union is total
    Seq((10L, 100L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GovernanceQueries.q166_key_skew(spark, dir).collect()
      .filter(_.getString(0) == "orders.o_custkey")
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // counts {1,1,2,4}: bucket 0 holds two keys of count 1, bucket 1 one
    // key of count 2, bucket 2 one key of count 4
    assert(got.toSeq === Seq(
      (0, 2L, 2L, 1L, 1L),
      (1, 1L, 2L, 2L, 2L),
      (2, 1L, 4L, 4L, 4L)))
  }

  test("q167: flags are exactly the members of under-populated buckets") {
    import graft.functions.{VectorFunctions => V}
    import org.apache.spark.sql.functions._
    val b = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), V.lshBucket(
        V.asDouble(col("embedding")), VectorQueries.planes).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val dens = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = b.filter(v => dens(v._2) <= VectorQueries.densityOutlierMax)
      .map(v => (v._1, v._2, dens(v._2))).sortBy(_._1)
    val got = VectorQueries.q167_embedding_outliers(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.forall(g => g._3 >= 1 && g._3 <= VectorQueries.densityOutlierMax))
  }

  test("q168: skip-week churn, terminal churn, and the excluded last week") {
    import spark.implicits._
    val dir = tmp("churn")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"), // A w1
      (2L, ts("2024-01-08 10:00:00"), 1L, "view", 0.0, "{}"), // A w2
      (3L, ts("2024-01-01 11:00:00"), 2L, "view", 0.0, "{}"), // B w1 only
      (4L, ts("2024-01-01 12:00:00"), 3L, "view", 0.0, "{}"), // C w1
      (5L, ts("2024-01-15 12:00:00"), 3L, "view", 0.0, "{}")) // C w3 (skip w2)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.q168_churn_labels(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // w1: A retained, B churned (terminal), C churned (skip) → 2/3
    // w2: A churned (terminal) → 1/1; w3 is the last week → excluded
    assert(got.toSeq === Seq(
      ("2024-01-01", 3L, 2L, 666666L),
      ("2024-01-08", 1L, 1L, 1000000L)))
  }

  test("q169: identical distributions overlap exactly 10^6; disjoint emit nothing") {
    import spark.implicits._
    val dir = tmp("ssim")
    Seq((1L, "alpha alpha beta beta", "s0"), (2L, "alpha alpha beta beta", "s1"),
      (3L, "gamma gamma gamma gamma", "s2"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q169_source_similarity(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("s0", "s1") -> 1000000L))
  }

  test("q170: dominant head vs uniform vocabulary extremes") {
    import spark.implicits._
    val dir = tmp("head")
    val uniform = (1 to 200).map(i => s"tok$i").mkString(" ")
    Seq((1L, "x x x x y", "dom"), (2L, uniform, "uni"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q170_head_mass(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("dom") === ((2L, 5L, 1000000L, 1000000L)))
    // 200 singleton tokens: top-10 carry 10/200, top-100 carry 100/200
    assert(got("uni") === ((200L, 200L, 50000L, 500000L)))
  }
}
