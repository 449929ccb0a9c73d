package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins (point-in-interval), which Spark has no native operator
  * for — a naive `a.join(b, a.v >= b.lo && a.v < b.hi)` plans as a
  * nested-loop join.
  *
  * Two strategies:
  *  - [[broadcastRange]]: fine when the interval side is tiny (the
  *    nested loop is per-row over a broadcast handful).
  *  - [[binned]]: the scalable shape — quantize both sides to
  *    fixed-width bins (intervals explode to every bin they touch),
  *    equi-join on the bin, then apply the exact range predicate.
  *    The join is hash-based and shuffles by bin; output size is the
  *    true match count plus only same-bin near-misses.
  */
object RangeJoin {

  /** Interval side columns: (lo inclusive, hi exclusive). */
  final case class Intervals(df: DataFrame, lo: String, hi: String)

  def broadcastRange(points: DataFrame, v: Column, ivs: Intervals): DataFrame =
    points.join(broadcast(ivs.df), v >= col(ivs.lo) && v < col(ivs.hi))

  def binned(points: DataFrame, v: Column, ivs: Intervals, binWidth: Double): DataFrame = {
    // end bin is floor(hi/binWidth) with NO epsilon: an epsilon
    // under-shoots when hi sits just above a bin boundary and silently
    // drops true matches in the last bin; the exact predicate below
    // already discards the at-most-one extra near-miss bin. Degenerate
    // intervals (hi <= lo) must yield NO bins — Spark's sequence()
    // steps -1 when start > stop and would explode a huge descending
    // bin list from corrupt data.
    val startBin = floor(col(ivs.lo) / binWidth).cast("long")
    val endBin = floor(col(ivs.hi) / binWidth).cast("long")
    val binnedIvs = ivs.df
      .filter(col(ivs.hi) > col(ivs.lo))
      .withColumn("__bin", explode(sequence(startBin, endBin)))
    points
      .withColumn("__bin", floor(v / binWidth).cast("long"))
      .join(binnedIvs, "__bin")
      .filter(v >= col(ivs.lo) && v < col(ivs.hi))
      .drop("__bin")
  }
}
