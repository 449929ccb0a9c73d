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

  test("IVF restriction: every query's ADC candidates come from probed cells only, fewer than the flat scan") {
    val n = emb.count()
    val q = 50L
    val flatScan = q * (n - 1) // what flat ADC (pre-IVF) scored
    val cand = VectorQueries.pqAdcCandidates(spark, sf())
    // the shortlist itself is capped at 50/query; the BOUND to pin is
    // that the scored set was cell-restricted — reconstruct the probed
    // cell population and check it is a strict cut of the corpus
    val ivf = IvfIndex.train(emb, "v", k = 16, sampleIdCol = Some("vec_id"))
    val cells = ivf.cell(org.apache.spark.sql.functions.col("v"))
    val cellSizes = emb.select(cells.as("cell")).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedRows = emb.filter(col("vec_id") < 50).select("vec_id", "v").collect()
      .map { r =>
        ivf.probeCellsLocal(r.getSeq[Double](1).toArray, VectorQueries.pqNProbe)
          .map(c => cellSizes.getOrElse(c, 0L)).sum: Long
      }.sum
    assert(probedRows < flatScan / 2,
      s"probed-cell ADC work $probedRows should be well under the flat scan $flatScan")
    // and the shortlist only ever contains probed-cell members
    val shortlist = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    val cellOf = emb.select(col("vec_id"), cells.as("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probeOf = emb.filter(col("vec_id") < 50).select("vec_id", "v").collect()
      .map(r => r.getLong(0) ->
        ivf.probeCellsLocal(r.getSeq[Double](1).toArray, VectorQueries.pqNProbe).toSet)
      .toMap
    shortlist.foreach { case (qid, nid) =>
      assert(probeOf(qid).contains(cellOf(nid)),
        s"candidate $nid for query $qid is outside the probed cells")
    }
  }

  test("IVF-PQ recall@5 decomposes: coarse capture bounds it, PQ+rerank loses almost nothing more") {
    val pq = VectorQueries.q112_knn_ivfpq(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = VectorQueries.q28_knn_bruteforce(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(pq.keySet == brute.keySet)

    // exact-scoring IVF baseline with the SAME probed cells: its
    // recall IS the coarse quantizer's neighbor capture — the ceiling
    // any IVF-restricted method shares (q42's documented trade; the
    // knob is nProbe). Computed locally from the trained model.
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ivf = IvfIndex.train(emb, "v", k = 16, sampleIdCol = Some("vec_id"))
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val cellOf = rows.view.mapValues(v =>
      ivf.probeCellsLocal(v, 1).head).toMap
    val ivfExact = brute.keySet.map { q =>
      val probed = ivf.probeCellsLocal(rows(q), VectorQueries.pqNProbe).toSet
      val top = rows.toSeq
        .filter { case (id, _) => id != q && probed.contains(cellOf(id)) }
        .map { case (id, v) => (id, cosine(rows(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
      q -> top
    }.toMap

    def meanRecall(got: Map[Long, Set[Long]]): Double = {
      val rs = brute.map { case (q, truth) =>
        (got(q) intersect truth).size.toDouble / truth.size }
      rs.sum / rs.size
    }
    val capture = meanRecall(ivfExact)
    val endToEnd = meanRecall(pq)
    info(s"coarse capture = $capture, IVF-PQ end-to-end = $endToEnd")
    // (1) the 64x-compressed ADC shortlist + rerank must not lose
    // more than epsilon beyond what the coarse quantizer already
    // gave up — the PQ half of IVF-PQ is nearly free in recall
    assert(endToEnd >= capture - 0.05,
      s"PQ lost more than 0.05 beyond coarse capture: $endToEnd vs $capture")
    // (2) absolute floor: 4/16 probes on this corpus must still find
    // most neighbors (q42's recall@3 bound is 0.4 on the same cells)
    assert(endToEnd > 0.45, s"mean recall@5 = $endToEnd")
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
