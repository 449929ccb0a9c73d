package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-count maintenance — the sketch member of the
  * incremental-view family (q107 maintains algebraic aggregates as
  * (n, sum, min, max) state; distinct counts are not algebraic, so
  * their mergeable state is a Datasketches HLL sketch per group).
  *
  * The property that makes this correct and not merely convenient:
  * HLL union is register-wise max, so merging per-batch sketches is
  * LOSSLESS over the sketch state — batching never compounds error
  * the way adding per-batch estimates would. (Datasketches sketches
  * are not bit-identical across merge paths — sparse-to-dense
  * promotion can differ — so the pinned contract is estimates, not
  * bytes: IncrementalDistinctSpec bounds the incremental estimate
  * against the full-rescan estimate and both against the exact
  * count, for two AND three-way batchings.)
  * Refresh cost is O(|batch| + |groups| · sketch-bytes); a standing
  * "distinct users per segment" over a growing 100 TB corpus never
  * rescans history and never stores a per-key set.
  *
  * Estimates carry Datasketches' standard error (~1.6% at lgK=12) —
  * the documented trade for O(KB) mergeable state per group where an
  * exact distinct count would need unbounded state.
  */
object IncrementalDistinct {

  val lgConfigK = 12

  /** Sketch a batch into per-group partial state: one partial-agg
    * shuffle, |groups| rows out, each carrying an HLL sketch binary.
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("hll"))

  /** Merge any number of states: union + register-wise-max
    * re-aggregate. Associative and commutative by construction.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.map(_.select((keys ++ Seq("n", "hll")).map(col): _*))
      .reduce(_.unionAll(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        hll_union_agg(col("hll")).as("hll"))
  }

  /** Render state as the user-facing row: exact row count, estimated
    * distinct count.
    */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n").as("n_rows"),
        hll_sketch_estimate(col("hll")).as("approx_distinct")): _*)
}
