package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental QUANTILE maintenance — the third member of the
  * incremental-view family: q107 keeps algebraic aggregates as
  * (n, sum, min, max) state, q110 keeps distinct counts as HLL
  * state, and quantiles — fully holistic, unbounded exact state —
  * ride a Datasketches KLL sketch per group.
  *
  * KLL guarantees a NORMALIZED RANK error (~1.65% two-sided at the
  * default k=200): the estimate for quantile φ is a real data value
  * whose true rank is within φ±ε. Merging per-batch sketches
  * preserves that guarantee over the union — the property that makes
  * the state incremental: refresh = merge(state, sketch(batch)),
  * O(|batch| + |groups| · sketch-bytes), never a history rescan and
  * never a corpus-sized sort (exact grouped quantiles cost one; a
  * STANDING exact quantile over a growing corpus costs one per
  * refresh). KLL compaction is randomized, so estimates are not
  * bit-stable across runs; IncrementalQuantilesSpec pins the rank
  * error of both the one-shot and the batched paths against the
  * exact quantiles instead.
  */
object IncrementalQuantiles {

  /** Sketch a batch into per-group partial state. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        kll_sketch_agg_double(col(valueCol).cast("double")).as("kll"))

  /** Merge any number of states. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.map(_.select((keys ++ Seq("n", "kll")).map(col): _*))
      .reduce(_.unionAll(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        kll_merge_agg_double(col("kll")).as("kll"))
  }

  /** Render state as the user-facing quantile row. */
  def finish(state: DataFrame, keys: Seq[String],
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val qCols = quantiles.map { q =>
      kll_sketch_get_quantile_double(col("kll"), lit(q))
        .as("p" + math.round(q * 100))
    }
    state.select(keys.map(col) ++ (col("n").as("n_rows") +: qCols): _*)
  }
}
