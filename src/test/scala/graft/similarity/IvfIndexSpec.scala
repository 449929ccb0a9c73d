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
