package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-value axis with exact rank geometry — the scale-safe plan
  * for "value AT rank k" statistics (quantiles, fences, medians,
  * rank-sum formulas) over groups with FEW distinct keys.
  *
  * A raw-row window `PARTITION BY event_type ORDER BY value` drags
  * every row of a ~5-key corpus-scale table through 5 single-task
  * sorts. But every statistic of the form "the value at rank k" (and
  * any Σ f(rank)·value) is invariant to tie order, so it is fully
  * determined by the (group, value) → count table: collapse to the
  * DISTINCT-value axis with one hash aggregation (map-side combined,
  * no sort), then run the cumulative window over the axis — whose
  * size is bounded by the value DOMAIN (cents, char lengths, …),
  * independent of corpus row count.
  *
  * Emitted geometry per (group, value) row, all longs:
  *   - `cnt`  rows carrying this value;
  *   - `lo`   rows strictly before it in sort order (so the value
  *            occupies ranks `lo+1 … hi`);
  *   - `hi`   = lo + cnt (cumulative count through this value);
  *   - `n`    group total.
  * With a weight column, additionally `wcnt`/`wlo`/`whi`/`wtot` —
  * the same geometry over cumulative WEIGHT (e.g. quantity for a
  * weighted median).
  *
  * "Value at rank k" is then `max(when(lo < k && k <= hi, value))`
  * grouped by the group columns — identical to the window form for
  * any tie order, because every rank in (lo, hi] maps to this value.
  */
object ValueAxis {

  def axis(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("cnt") +:
      weightCol.toSeq.map(wc =>
        coalesce(sum(col(wc)), lit(0L)).cast("long").as("wcnt"))
    val ax = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val cum = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    var out = ax
      .withColumn("hi", sum(col("cnt")).over(cum))
      .withColumn("lo", col("hi") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(tot))
    weightCol.foreach { _ =>
      out = out
        .withColumn("whi", sum(col("wcnt")).over(cum))
        .withColumn("wlo", col("whi") - col("wcnt"))
        .withColumn("wtot", sum(col("wcnt")).over(tot))
    }
    out
  }

  /** The axis value at 1-based rank `k` (an expression over axis
    * columns, e.g. `expr("(n + 3) DIV 4")`), for use inside a
    * groupBy(groupCols) over an [[axis]] result. */
  def valueAtRank(valueCol: String, k: Column): Column =
    max(when(col("lo") < k && k <= col("hi"), col(valueCol)))
}
