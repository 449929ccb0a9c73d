package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental data-profile maintenance: keep a per-column profile
  * (value/null counts, numeric and string extrema, total string
  * length) fresh across batch ingests WITHOUT rescanning history —
  * [[IncrementalAgg]]'s contract applied to the profiling report
  * (q100) instead of a grouped aggregate.
  *
  * State is one row per profiled column carrying only MERGEABLE
  * statistics: counts sum, extrema take min-of-mins / max-of-maxes,
  * string length sums add. The finish step derives the presentation
  * ratio (avg string length in micro units) from final state, so
  * merge order can never change a result. Exact distinct counts are
  * deliberately NOT here — they are not algebraic; that is
  * [[IncrementalDistinct]]'s HLL-state story (q110).
  *
  * Scale shape: `state` is ONE wide scan collapsing to a single row
  * (partial aggregation all the way — no shuffle of data rows), then
  * a |columns|-row stack; `merge` and `finish` touch |columns| rows.
  * Refreshing after a batch costs O(|batch| + |columns|).
  */
object IncrementalProfile {

  private val stateCols = Seq(
    "n_values", "n_nulls", "min_num", "max_num", "min_str", "max_str", "sum_len")

  /** Profile a batch into per-column mergeable state. */
  def state(df: DataFrame, numeric: Seq[String], strings: Seq[String]): DataFrame = {
    val aggs = (numeric ++ strings).flatMap { c =>
      val isNum = numeric.contains(c)
      Seq(
        count(col(c)).cast("long").as(s"$c#n_values"),
        count_if(col(c).isNull).cast("long").as(s"$c#n_nulls"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"$c#min_num"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"$c#max_num"),
        (if (isNum) lit(null).cast("string") else min(col(c))).as(s"$c#min_str"),
        (if (isNum) lit(null).cast("string") else max(col(c))).as(s"$c#max_str"),
        (if (isNum) lit(null).cast("long")
         else sum(length(col(c)).cast("long")).cast("long")).as(s"$c#sum_len"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (numeric ++ strings).map { c =>
      (s"'$c'" +: stateCols.map(m => s"`$c#$m`")).mkString(", ")
    }.mkString(", ")
    one.selectExpr(
      s"stack(${numeric.size + strings.size}, $stackArgs) AS " +
        s"(column_name, ${stateCols.mkString(", ")})")
  }

  /** Merge any number of states: |columns|-sized work, associative
    * and commutative by construction (min/max ignore the NULL slots
    * of the other column class). */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.map(_.select(("column_name" +: stateCols).map(col): _*))
      .reduce(_ unionAll _)
      .groupBy("column_name")
      .agg(
        sum(col("n_values")).cast("long").as("n_values"),
        sum(col("n_nulls")).cast("long").as("n_nulls"),
        min(col("min_num")).as("min_num"),
        max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"),
        max(col("max_str")).as("max_str"),
        sum(col("sum_len")).cast("long").as("sum_len"))
  }

  /** Render state as the profile report row (q100's columns minus
    * n_distinct). The avg-length ratio divides FINAL values once, so
    * engines agree bit-for-bit. sum_len*1e6 runs in DECIMAL(38,0) —
    * a long product overflows once a column's total string bytes pass
    * ~9.2e12 (~9 TB), i.e. exactly at the design scale. */
  def finish(state: DataFrame): DataFrame =
    state.select(
      col("column_name"), col("n_values"), col("n_nulls"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"),
      when(col("sum_len").isNotNull && col("n_values") > 0,
        floor(col("sum_len").cast("decimal(38,0)") * 1000000L / col("n_values")))
        .cast("long").as("avg_len_micro"))
}
