package graft.io

import graft.meta.SinkDef
import org.apache.spark.sql.DataFrame

/** Metadata-driven sink writing (reference pipeline/sink.py:write_df),
  * extended with partitioned layout — at scale, partitioning the output
  * by e.g. batch date is what makes downstream incremental reads prune.
  */
object SinkWriter {

  def write(df: DataFrame, sink: SinkDef, subs: SourceReader.Substitutions): String = {
    val path = subs(sink.path)
    require(path.nonEmpty, "sink path must be a non-empty string")
    val w = df.write.format(sink.format).mode(sink.saveMode)
    val partitioned = if (sink.partitionBy.nonEmpty) w.partitionBy(sink.partitionBy: _*) else w
    partitioned.save(path)
    path
  }
}
