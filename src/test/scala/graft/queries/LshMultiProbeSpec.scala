package graft.queries

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q70's claim: the probe budget buys recall, not scanning. Multi-probe
  * at 12 planes must (a) strictly beat single-probe at the SAME 12
  * planes — the probing mechanism itself — and (b) reach at least
  * single-probe-8-plane recall while scanning no more candidates —
  * the equal-scan-fraction comparison. Everything here is
  * deterministic (md5 planes, fixed corpus), so strict inequalities
  * are stable, not flaky.
  */
class LshMultiProbeSpec extends SparkSpec {

  private def emb: DataFrame =
    graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))

  /** Candidate (q_id, n_id) pairs scanned by a probe configuration. */
  private def candidates(planes: Seq[Seq[Double]], multiProbe: Boolean): DataFrame = {
    val e = emb.withColumn("bucket", V.lshBucket(col("v"), planes))
    val probeCol =
      if (multiProbe)
        explode(array(col("bucket") +:
          planes.indices.map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*))
      else col("bucket")
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), probeCol.as("probe"))
    val c = e.select(col("vec_id").as("n_id"), col("bucket").as("probe"))
    q.join(c, Seq("probe")).filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
  }

  private def recallAt3(cand: DataFrame): Double = {
    val truth = VectorQueries.q28_knn_bruteforce(spark, sf())
      .filter(col("rk") <= 3)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = cand.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val rs = truth.map { case (q, t) =>
      got.get(q).map(f => (f intersect t).size.toDouble / t.size).getOrElse(0.0)
    }
    rs.sum / rs.size
  }

  test("multi-probe strictly beats single-probe at the same plane count") {
    val single12 = candidates(VectorQueries.planesMulti, multiProbe = false)
    val multi12 = candidates(VectorQueries.planesMulti, multiProbe = true)
    val (rSingle, rMulti) = (recallAt3(single12), recallAt3(multi12))
    assert(rMulti > rSingle,
      s"multi-probe recall@3 $rMulti not above single-probe $rSingle at 12 planes")
  }

  test("multi-probe at 12 planes matches 8-plane single-probe recall with fewer scans") {
    val single8 = candidates(VectorQueries.planes, multiProbe = false)
    val multi12 = candidates(VectorQueries.planesMulti, multiProbe = true)
    val (scan8, scan12) = (single8.count(), multi12.count())
    assert(scan12 <= scan8,
      s"multi-probe scanned $scan12 candidates vs single-probe $scan8 — probing must not cost more")
    val (r8, r12) = (recallAt3(single8), recallAt3(multi12))
    assert(r12 >= r8,
      s"multi-probe recall@3 $r12 below 8-plane single-probe $r8 at smaller scan")
  }
}
