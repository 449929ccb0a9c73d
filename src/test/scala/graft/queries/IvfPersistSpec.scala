package graft.queries

import graft.SparkSpec

/** q96's claim: the persisted IVF index (stored centroids + inverted
  * file with precomputed norms) answers ANN queries identically to
  * q42's self-contained train-and-search — same neighbours, same
  * ranks, same cosines. Doubles round-trip parquet exactly, so this
  * is equality, not tolerance.
  */
class IvfPersistSpec extends SparkSpec {

  test("stored-index ANN equals the fresh train-and-search, row for row") {
    val dir = sf("sf0.01")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val fresh = key(VectorQueries.q42_knn_ivf(spark, dir).collect())
    val stored = key(VectorQueries.q96_ivf_index_persist(spark, dir).collect())
    assert(fresh.nonEmpty)
    assert(stored == fresh)
  }

  test("quantizer training is deterministic (keeps the shared-model memo honest)") {
    // q42/q96 share one memoized model per corpus dir; that is only
    // sound if a fresh training reproduces it exactly
    val dir = sf("sf0.01")
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.VectorFunctions.asDouble(
          org.apache.spark.sql.functions.col("embedding")).as("v"))
    val a = graft.similarity.IvfIndex.train(e, "v", k = 16, sampleIdCol = Some("vec_id"))
    val b = graft.similarity.IvfIndex.train(e, "v", k = 16, sampleIdCol = Some("vec_id"))
    assert(a.centroids == b.centroids)
  }
}
