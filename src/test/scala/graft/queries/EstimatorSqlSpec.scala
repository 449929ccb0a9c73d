package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q191 (identical docs estimate exactly 10⁶ with zero error;
  * estimates live on the k=12 lattice; real-pair error bounded) and
  * q192 (the SQL-string surface equals the DataFrame-API
  * recomputation — one engine, two front doors).
  */
class EstimatorSqlSpec extends SparkSpec {

  test("q191: estimates sit on the 12-step lattice and behave on real pairs") {
    val rows = TextQueries.q191_minhash_estimate(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val lattice = (0 to 12).map(m => m.toLong * 1000000L / 12L).toSet
    assert(rows.forall(r => lattice.contains(r._3)), "estimate off the k=12 lattice")
    assert(rows.forall(r => r._5 === math.abs(r._3 - r._4)))
    // q25's pairs are all true near-dups (jac >= 0.9); a 12-component
    // estimator must stay within a few lattice steps of truth
    assert(rows.forall(_._5 <= 250000L), s"error blew up: ${rows.maxBy(_._5)}")
  }

  test("q191: planted identical documents estimate exactly 10^6 with zero error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mhe").toString
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    Seq((1L, text), (2L, text), (3L, "entirely different other words populate this body"))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.q191_minhash_estimate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq((1L, 2L, 1000000L, 1000000L, 0L)))
  }

  test("q192: the SQL front door equals the DataFrame front door") {
    import graft.functions.{TextFunctions => T}
    val sql = TextQueries.q192_sql_surface(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val api = graft.Tables.load(spark, sf("sf0.01"), "documents")
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(size(T.tokens(col("text")))).cast("long").as("t"),
        max(size(T.tokens(col("text")))).cast("long").as("m"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sql === api)
  }
}
