package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout writer: range clustering for scan pruning.
  *
  * `repartitionByRange` assigns each output file a disjoint range of
  * the clustering key (sampled range boundaries) and the
  * within-partition sort orders rows inside each file — so every
  * parquet file and every row group carries tight, non-overlapping
  * min/max statistics. Any stats-aware reader (Spark's row-group
  * skipping, lakehouse file pruning) then reads only the files whose
  * range intersects the predicate: a range query over 1/N of the key
  * space touches ~1/N of a 100 TB table instead of all of it. The
  * sort also maximizes RLE/dictionary compression on the clustered
  * columns. This is the range-predicate complement of hash bucketing
  * (which co-locates equi-join keys but scatters ranges).
  */
object Layout {

  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int, cols: String*): Unit = {
    require(cols.nonEmpty, "range clustering needs at least one column")
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Bits of the interleaved code per dimension. 16 bits × up to 3
    * dims stays inside a BIGINT with room to spare; finer than the
    * file count ever resolves.
    */
  private[io] val zBits = 16

  /** The Morton (Z-order) code of `scaled` values, each already
    * normalized into [0, 2^zBits): bit i of dimension j lands at
    * interleaved position i·k + j. Pure integer bitwise ops — one
    * codegen'd projection, no UDF.
    */
  private[io] def zCode(scaled: Seq[Column]): Column = {
    val k = scaled.size
    (0 until zBits).flatMap { i =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Multi-dimensional clustering: interleave the bits of each
    * clustering column (min/max-normalized to 16-bit cells,
    * division-first so no intermediate overflows) and range-cluster on
    * the resulting Morton code. Where [[writeRangeClustered]] gives
    * perfect pruning on its leading column and none on the others,
    * Z-ordering gives every clustered dimension PARTIAL pruning: each
    * output file covers a contiguous z-range = a small rectangle in
    * key space, so a predicate band on ANY clustered column skips the
    * files whose rectangle misses it. The per-dimension min/max come
    * from one tiny aggregate (2 longs per column on the driver —
    * bounds metadata, not data).
    *
    * This is the same layout decision `OPTIMIZE ... ZORDER BY` makes
    * in lakehouse table formats, expressed directly over parquet +
    * stats pruning.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, cols: String*): Unit = {
    require(cols.size >= 2, "z-ordering needs at least two columns; use writeRangeClustered for one")
    require(cols.size * zBits <= 62, s"at most ${62 / zBits} z-order columns")
    val boundAggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      // min/max of an empty input or an all-NULL column are NULL; a
      // raw getLong would NPE and per-row NULLs would produce NULL
      // Morton codes that silently collapse into one range partition
      require(!bounds.isNullAt(2 * i) && !bounds.isNullAt(2 * i + 1),
        s"cannot z-order on '$c': empty input or all-NULL clustering column")
    }
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = (bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
      // power-of-two cell width: drop just enough low bits that the
      // scaled value fits zBits — pure integer ops, nothing overflows
      val dropBits = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(mx - mn) - zBits)
      // per-row NULL keys are explicitly bucketed at the min cell (a
      // NULL would otherwise poison the whole interleaved code)
      shiftright(coalesce(col(c).cast("long"), lit(mn)) - lit(mn), dropBits)
    }
    df.withColumn("__z", zCode(scaled))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
