package graft.queries

import graft.SparkSpec

/** q76's claim: persisting the signature index (with shingle-key sets)
  * and re-deriving near-dup pairs from storage loses nothing vs q25's
  * from-raw-text computation — same pairs, same jaccard values.
  */
class SigIndexPersistSpec extends SparkSpec {

  test("pairs from the persisted index equal q25's from-text pairs") {
    val fromIndex = TextQueries.q76_sig_index_persist(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fromText = TextQueries.q25_minhash_lsh_pairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fromIndex.keySet == fromText.keySet)
    // key-set Jaccard == string-set Jaccard, bit for bit
    fromText.foreach { case (pair, j) => assert(fromIndex(pair) == j, s"pair $pair") }
    assert(fromIndex.nonEmpty)
  }

  test("q94: incrementally maintained index is indistinguishable from a rebuild") {
    // downstream pairs (the driver gate's view)
    val updated = TextQueries.q94_sig_index_update(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fromText = TextQueries.q25_minhash_lsh_pairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(updated == fromText)
    assert(updated.nonEmpty)
    // ...and both the existing and the appended partition contributed
    // (a split where one side is empty would pass trivially)
    import org.apache.spark.sql.functions._
    val flag = substring(md5(concat(lit("b73|"), col("doc_id").cast("string"))), 1, 1)
      .isin("0", "1")
    val docs = graft.Tables.load(spark, sf(), "documents")
    assert(docs.filter(flag).count() > 0 && docs.filter(!flag).count() > 0)
  }
}
