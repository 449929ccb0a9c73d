package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the round-6 lifecycle/composition
  * operators (q84 persisted BM25 index, q85 CDC changelog, q86
  * curation funnel); exact values are pinned by their DuckDB oracles.
  */
class Round6OpsSpec extends SparkSpec {

  test("q84: the persisted index ranks bit-identically to the from-text build") {
    val dir = sf("sf0.01")
    val fromText = RetrievalQueries.q83_bm25(spark, dir).collect()
    val fromIndex = RetrievalQueries.q84_bm25_index_persist(spark, dir).collect()
    assert(fromText.length == fromIndex.length)
    fromText.zip(fromIndex).foreach { case (a, b) => assert(a == b) }
  }

  test("q85: changelog classifies the 1998+ ingest correctly") {
    val dir = sf("sf0.01")
    val rows = ChangeCapture.q85_cdc_changelog(spark, dir).collect()
    assert(rows.nonEmpty)
    val byOp = rows.groupBy(_.getString(0))
    // append-only flow: consolidation never loses a key
    assert(!byOp.contains("delete"))
    // inserts carry no old image, updates carry both and differ
    byOp.getOrElse("insert", Array.empty).foreach { r =>
      assert(r.isNullAt(2) && !r.isNullAt(3))
    }
    byOp.getOrElse("update", Array.empty).foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getLong(2) != r.getLong(3) || r.getString(4) != r.getString(5)
        || r.get(6) != r.get(7))
    }
    // every changed key's new image is the keep-newest over ALL orders:
    // an update's new_date can never precede its old_date
    byOp.getOrElse("update", Array.empty).foreach { r =>
      assert(r.getString(5) >= r.getString(4))
    }
  }

  test("q86: funnel is monotone and stages agree with the standalone operators") {
    val dir = sf("sf0.01")
    val f = CurationQueries.q86_curation_e2e(spark, dir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val Seq(raw, ex, near, qual, fin) = (1 to 5).map(r.getLong)
      assert(raw >= ex && ex >= near && near >= qual && qual >= fin)
      assert(r.getLong(6) >= 0)
    }
    // stage-1 total = q23's representative count
    val nExact = f.map(_.getLong(2)).sum
    assert(nExact == TextQueries.q23_dedup_exact(spark, dir).count())
    // stage-2 drop = q60's cluster non-representatives, applied to
    // exact survivors (exact reps are by construction distinct texts,
    // so the near-dup drop hits the same ids q60 drops)
    val nNear = f.map(_.getLong(3)).sum
    val q60 = CurationQueries.q60_dedup_apply(spark, dir).count()
    assert(nNear <= q60)
  }
}
