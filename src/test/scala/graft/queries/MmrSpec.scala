package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q178's greedy loop against a sequential replica driven by the
  * same candidate relevance and pairwise-similarity inputs, and that
  * the penalty term actually changes at least one query's order vs
  * pure BM25.
  */
class MmrSpec extends SparkSpec {

  test("q178: greedy selection matches a sequential replica on real candidates") {
    import graft.functions.{VectorFunctions => V}
    val k = RetrievalQueries.bm25TopK
    val cand = RetrievalQueries.q83_bm25(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        ((k - r.getInt(3) + 1).toLong * 1000000L) / k))
    val dv = graft.Tables.load(spark, sf("sf0.01"), "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expect = cand.groupBy(_._1).flatMap { case (q, cs) =>
      val rel = cs.map(c => c._2 -> c._3).toMap
      var picked = Vector.empty[(Long, Long, Long)] // (doc, penalty, mmr)
      for (_ <- 1 to RetrievalQueries.mmrK if picked.length < rel.size) {
        val rem = rel.keySet -- picked.map(_._1)
        val scored = rem.toSeq.map { d =>
          val pen = if (picked.isEmpty) 0L
            else picked.map(p =>
              math.floor(cos(dv(d), dv(p._1)) * 1000000L).toLong).max
          (d, pen, rel(d) - pen)
        }
        picked :+= scored.minBy(s => (-s._3, s._1))
      }
      picked.zipWithIndex.map { case ((d, pen, m), i) =>
        (q, i + 1) -> ((d, rel(d), pen, m)) }
    }
    val got = RetrievalQueries.q178_mmr(spark, sf("sf0.01")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q178: a near-duplicate runner-up is demoted below the orthogonal third hit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    val q0 = "dup merge batch" // query 0's literal terms
    val docs = Seq(
      (1L, Seq.fill(5)(q0).mkString(" ")),             // strongest hit
      (2L, Seq.fill(4)(q0).mkString(" ")),             // runner-up, SAME vector as 1
      (3L, s"$q0 unrelated words fill this text out"), // weaker, orthogonal vector
      (4L, "alpha beta gamma delta epsilon zeta"),
      (5L, "eta theta iota kappa lambda mu"))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)), (4L, Array(0f, 0f, 1f, 0f)),
      (5L, Array(0f, 0f, 0f, 1f)))
    vecs.map { case (id, v) => (id, "l0", v) }
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val bm = RetrievalQueries.q83_bm25(spark, dir).collect()
      .filter(_.getInt(0) == 0).sortBy(_.getInt(3)).map(_.getLong(1)).take(3)
    assert(bm.toSeq === Seq(1L, 2L, 3L)) // fixture sanity: bm25 order by tf
    val mmr = RetrievalQueries.q178_mmr(spark, dir).collect()
      .filter(_.getInt(0) == 0).sortBy(_.getInt(1))
      .map(r => (r.getLong(2), r.getLong(4)))
    // pick 1: doc 1 (penalty 0); pick 2: doc 3 — doc 2's cos-1 penalty
    // (10^6) sinks it below the orthogonal hit; doc 2 only at rank 3
    assert(mmr.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(mmr(1)._2 === 0L)       // doc 3 is orthogonal to doc 1
    assert(mmr(2)._2 === 1000000L) // doc 2 pays the full near-dup penalty
  }
}
