package graft.queries

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** q87's claim: trained cells bound the candidate set AND keep the
  * near-dups discoverable. Measured at sf0.01: dup-id recall ≈ 0.49
  * vs the exact all-pairs truth with ~12% of the pairwise work, while
  * the random-cut LSH counterpart (q30, 8 hyperplanes) recalls ≈ 0.03
  * of the same truth — data-adaptive cells keep dense regions
  * together, which is the entire SemDeDup bet.
  */
class SemDedupSpec extends SparkSpec {

  private def truthDups(dir: String): Set[Long] = {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("qv"),
      V.norm(col("v")).as("q_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("nv"),
      V.norm(col("v")).as("n_nrm"))
    val cos = V.cosineWithNorms(col("qv"), col("nv"), col("q_nrm"), col("n_nrm"))
    broadcast(a).join(b, col("a_id") < col("b_id"))
      .select(col("b_id"), cos.as("cos"))
      .filter(col("cos") > VectorQueries.nearDupThreshold)
      .select("b_id").distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("q87: every flagged dup is real, recall beats LSH q30, candidates stay bounded") {
    val dir = sf("sf0.01")
    val truth = truthDups(dir)
    val sem = VectorQueries.q87_semdedup(spark, dir).collect()
    assert(sem.nonEmpty)
    // precision 1 by construction (exact cosine verify within cells):
    // every reported dup_id must be a true near-dup, keep_id below it
    val semIds = sem.map(_.getLong(0)).toSet
    assert(semIds.subsetOf(truth))
    sem.foreach { r =>
      assert(r.getLong(1) < r.getLong(0))
      assert(r.getDouble(3) > VectorQueries.nearDupThreshold)
    }
    // recall floor (measured 0.49 at sf0.01 with 8 cells)
    val recall = semIds.size.toDouble / truth.size
    assert(recall >= 0.4, f"semdedup recall $recall%.3f below floor")
    // the trained cells must beat the data-oblivious LSH cut on the
    // same truth (measured 0.03 for q30's 8-hyperplane buckets)
    val lshIds = VectorQueries.q30_embedding_dedup(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(recall > lshIds.size.toDouble / truth.size)
    // candidate-bound invariant: sum of within-cell pair counts is a
    // small fraction of all-pairs (the reason this scales at all) —
    // measured on q87's OWN two-level assignment
    val cells = VectorQueries.semDedupAssigned(spark, dir)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val n = cells.sum
    val candidates = cells.map(c => c * (c - 1) / 2).sum
    assert(candidates * 2 < n * (n - 1) / 2,
      s"within-cell candidates $candidates not bounded vs all-pairs ${n * (n - 1) / 2}")
  }
}
