package graft.similarity

import graft.SparkSpec
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  test("every vector lands in exactly one of k cells; probes are distinct") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val model = IvfIndex.train(e, "v", k = 8)
    assert(model.centroids.length == 8)
    val cells = e.withColumn("cell", model.cell(col("v")))
    assert(cells.count() == e.count())
    val distinctCells = cells.select("cell").distinct().count()
    assert(distinctCells > 1 && distinctCells <= 8)
    val probes = e.limit(5)
      .select(model.probeCells(col("v"), 3).as("p"))
      .collect().map(_.getSeq[Int](0))
    assert(probes.forall(p => p.length == 3 && p.distinct.length == 3))
  }

  test("two-level quantizer: deterministic, √k-shaped, total and bounded cell ids") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val k = 9
    val m1 = IvfIndex.trainTwoLevel(e, "v", k, sampleIdCol = Some("vec_id"))
    val m2 = IvfIndex.trainTwoLevel(e, "v", k, sampleIdCol = Some("vec_id"))
    // train-twice equality: no RNG anywhere
    assert(m1 == m2)
    // √k shape: 3 top cells, each with <= 3 fine centroids, >= k total
    assert(m1.top.length == 3)
    assert(m1.fine.forall(f => f.nonEmpty && f.length <= 3))
    assert(m1.numCells >= k || m1.numCells == m1.fine.map(_.length).sum)
    // assignment is total and in-range: every vector lands in exactly
    // one global cell id within [0, numCells)
    val assigned = e
      .withColumn("topcell", m1.topCell(col("v")))
      .withColumn("cell", m1.cell(col("topcell"), col("v")))
    assert(assigned.count() == e.count())
    val range = assigned.agg(min("cell"), max("cell")).collect().head
    assert(range.getInt(0) >= 0 && range.getInt(1) < m1.numCells)
    // fine refinement is real: more distinct global cells than top cells
    val nTop = assigned.select("topcell").distinct().count()
    val nCell = assigned.select("cell").distinct().count()
    assert(nCell >= nTop)
  }

  test("IVF 4-probe recall@3 beats random-scan expectations vs brute force") {
    val ivf = VectorQueries.q42_knn_ivf(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = VectorQueries.q28_knn_bruteforce(spark, sf())
      .filter(col("rk") <= 3)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      ivf.get(q).map(found => (found intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // 4 of 16 cells scanned = 25% of the corpus; random 25% would give
    // recall ~0.25 — the trained quantizer must do meaningfully better
    assert(meanRecall > 0.4, s"mean recall@3 = $meanRecall")
  }
}
