package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the cluster-resolution step of corpus
  * dedup: near-dup candidate PAIRS (MinHash-LSH, SimHash, embedding
  * cosine) only become removable duplicates once transitive groups
  * are resolved (a~b, b~c ⇒ {a,b,c} is one cluster with one kept
  * representative).
  *
  * Algorithm: every vertex starts labeled with its own id; each round
  * every vertex takes the min of its label and its neighbors' labels;
  * fixpoint = component-min labels. Rounds needed = graph diameter.
  * Near-dup graphs are tiny near-cliques (diameter 1–3), so this
  * converges in 2–4 rounds regardless of corpus size; each round is
  * one shuffle of the LABEL table (|vertices in any pair| rows — at
  * most a few % of the corpus, never the corpus itself).
  *
  * Lineage is truncated per round with localCheckpoint — without it
  * the plan doubles per iteration. On a cluster, reliable
  * checkpointing (sc.setCheckpointDir + checkpoint) or writing rounds
  * to storage replaces this for fault tolerance. For adversarial
  * graphs with long chains, swap the round body for the large-star/
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce"), which converges in O(log n) rounds on any shape.
  */
object ConnectedComponents {

  /** Returns one row per distinct vertex appearing in `edges`:
    * (id, component) where component = min vertex id reachable.
    */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .persist()

    var labels = und.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = und.join(labels, und("v") === labels("id"))
        .groupBy(col("u"))
        .agg(min("component").as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(col("id"), col("component"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("next_component"))
        .localCheckpoint()
      changed = next.filter(col("next_component") =!= col("component")).count()
      labels = next.select(col("id"), col("next_component").as("component"))
      iter += 1
    }
    und.unpersist()
    // an unconverged result is silently WRONG (split clusters → under-
    // deduplication downstream), never return it
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter or use " +
          "star-contraction for long-chain graphs")
    labels
  }
}
