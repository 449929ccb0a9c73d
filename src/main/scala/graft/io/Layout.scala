package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
