package graft.similarity

import graft.SparkSpec
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, sf(), "embeddings")
    .select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))

  test("training is deterministic; codes are in range and complete") {
    val a = PqIndex.train(emb, "v", m = 8, ksub = 16, sampleIdCol = Some("vec_id"))
    val b = PqIndex.train(emb, "v", m = 8, ksub = 16, sampleIdCol = Some("vec_id"))
    assert(a.codebooks == b.codebooks)
    assert(a.m == 8 && a.ksub == 16 && a.dsub == 8)
    val codes = a.encodeFrom(emb, "v", "c").select("c")
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    // codebooks are actually used: more than one code per sub-space
    (0 until 8).foreach { sub =>
      assert(codes.map(_(sub)).distinct.length > 1, s"sub-space $sub collapsed")
    }
  }

  test("ADC+rerank recall@5 against the exact brute force") {
    val pq = VectorQueries.q112_knn_ivfpq(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = VectorQueries.q28_knn_bruteforce(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(pq.keySet == brute.keySet)
    val recalls = brute.map { case (q, truth) =>
      (pq(q) intersect truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 50-candidate ADC shortlist out of a ~200-vector corpus, exact
    // rerank on top: most of the exact top-5 must survive the
    // shortlist. (Measured ~0.9+; 0.7 leaves headroom for corpus
    // regeneration without letting a broken codebook pass.)
    assert(mean > 0.7, s"mean recall@5 = $mean")
  }

  test("rerank output is exactly the cosine ranking of the PQ shortlist") {
    // every returned cos must equal the exact cosine (the rerank is
    // exact — PQ only shortlists), checked against q28's scores
    val pq = VectorQueries.q112_knn_ivfpq(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val brute = VectorQueries.q28_knn_bruteforce(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { case (key, cosPq) =>
      brute.get(key).foreach { cosExact =>
        assert(java.lang.Double.doubleToRawLongBits(cosPq) ==
          java.lang.Double.doubleToRawLongBits(cosExact),
          s"$key: pq=$cosPq exact=$cosExact")
      }
    }
  }
}
