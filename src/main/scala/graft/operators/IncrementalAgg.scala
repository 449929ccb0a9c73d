package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-aggregate maintenance: keep a grouped aggregate fresh
  * across batch ingests WITHOUT rescanning history.
  *
  * The trick is storing the aggregate as mergeable PARTIAL STATE —
  * (n, sum, min, max) per group, the same shape Spark's own partial
  * aggregation ships between map and reduce — so refreshing after a
  * new batch is `merge(state, aggregate(batch))`: O(|batch| + |groups|)
  * work. The reference pipeline re-derives consolidated outputs from
  * scratch per run (reference pipeline/consolidator.py full mode);
  * at 100 TB a dashboard aggregate that rescans history on every
  * ingest is dead — this operator is the engine form of the
  * incremental-view-maintenance deal: ingest cost proportional to the
  * delta, query cost proportional to |groups|.
  *
  * Only algebraic aggregates participate (count/sum/min/max and
  * anything derivable from them at finish time, e.g. avg). Holistic
  * aggregates (exact quantiles) need their own sketch state — q41's
  * family.
  *
  * Sums are carried in decimal(38,2) (exact, order-independent —
  * SURVEY §4), so merge order can never change a result.
  */
object IncrementalAgg {

  private val stateCols = Seq("n", "s", "mn", "mx")

  /** Aggregate a batch into partial state: one partial-agg shuffle,
    * |groups| rows out.
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("s"),
        min(col(valueCol).cast("decimal(18,2)")).as("mn"),
        max(col(valueCol).cast("decimal(18,2)")).as("mx"))

  /** Merge any number of states: union + re-aggregate, |groups|-sized
    * work. Associative and commutative by construction.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.map(_.select((keys ++ stateCols).map(col): _*))
      .reduce(_.unionAll(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        sum(col("s")).cast("decimal(38,2)").as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Render state as the user-facing aggregate row. avg is derived at
    * finish time (sum/n in exact decimal, surfaced as double — the
    * division happens once on final values, so engines agree).
    */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n").as("n_rows"),
        col("s").cast("double").as("total"),
        col("mn").cast("double").as("min_value"),
        col("mx").cast("double").as("max_value"),
        (col("s").cast("double") / col("n")).as("avg_value")): _*)
}
