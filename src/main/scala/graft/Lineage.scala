package graft

import org.apache.spark.sql.DataFrame

/** Optional lineage cut for query results that are eagerly
  * materialized for PERFORMANCE (a small result checkpointed so a
  * cached upstream can be released, or so an iterative consumer does
  * not re-run the producing pipeline once per action).
  *
  * `localCheckpoint()` replaces the logical plan with a `LogicalRDD`
  * scan, which blinds the plan audit ([[Explain]]) to every exchange
  * and join beneath it. Setting `-Dgraft.keepLineage=true` (done by
  * Explain itself) turns these cuts into no-ops so the full plan is
  * visible; execution stays correct either way, only slower, because
  * every [[cut]] site is a pure performance materialization.
  *
  * Checkpoints that are CORRECTNESS-critical — results that must be
  * materialized before a temp work dir is deleted
  * (PipelineQueries/StreamingParity) — call `localCheckpoint()`
  * directly and are never disabled.
  *
  * Fault-tolerance trade at cluster scale: `localCheckpoint` DROPS the
  * RDD lineage, so losing an executor that holds checkpoint blocks
  * fails the job instead of recomputing. On a real cluster, sites
  * motivated by re-execution cost (rather than lineage depth) should
  * prefer `persist(StorageLevel.DISK_ONLY)` + `unpersist`, which keeps
  * lineage for recovery; local[32] has no executor loss, so the
  * cheaper cut is the right harness default.
  */
object Lineage {
  def keepLineage: Boolean = java.lang.Boolean.getBoolean("graft.keepLineage")

  def cut(df: DataFrame): DataFrame =
    if (keepLineage) df else df.localCheckpoint()
}
