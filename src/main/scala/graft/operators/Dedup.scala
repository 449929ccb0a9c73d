package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keep-newest-per-key deduplication.
  *
  * Semantics of reference pipeline/consolidator.py:32-57
  * (ROW_NUMBER() OVER (PARTITION BY key ORDER BY ord DESC) = 1), but
  * implemented as `max_by` over a deterministic ordering struct instead
  * of a window:
  *
  *   - a window must shuffle EVERY row to its key's partition, sort,
  *     and only then discard losers;
  *   - `max_by` is a declarative aggregate, so Spark runs a map-side
  *     partial aggregate first — at 100 TB with duplicate-heavy keys
  *     the shuffle carries at most one row per key per map task.
  *
  * A tie-breaker column is required so "newest" is total and the result
  * deterministic (the reference's bare ROW_NUMBER is
  * partition-order-dependent on ties).
  */
object Dedup {

  import Quoting.qcol

  /** One surviving row per `key`: the row with the greatest
    * (orderBy, tieBreaker) — or smallest, when `descending=false`.
    *
    * When `key` is a plain column of `df`, the output reuses the
    * GROUPING attribute for it (equal by definition to the winner's
    * key) instead of re-projecting it out of the winner struct — that
    * keeps the aggregation's hashpartitioning visible downstream, so a
    * later join/agg on the key elides its Exchange entirely.
    */
  def keepNewest(
      df: DataFrame,
      key: Column,
      orderBy: Column,
      tieBreaker: Column,
      descending: Boolean = true): DataFrame = {
    Seq("__dedup_key", "__winner").foreach { r =>
      require(!df.columns.contains(r), s"column name $r is reserved by Dedup.keepNewest")
    }
    val payload = struct(df.columns.toSeq.map(qcol): _*)
    // NULL ordering values must LOSE in both directions (the
    // reference's ROW_NUMBER semantics under NULLS LAST, and DuckDB's
    // default) — for the tie-breaker too, not just orderBy. Spark
    // struct comparison is nulls-first, so without the rank terms a
    // NULL row would win the ascending (min_by) case.
    def loses(c: Column) =
      if (descending) when(c.isNull, 0).otherwise(1) // max_by: non-null wins
      else when(c.isNull, 1).otherwise(0)            // min_by: non-null wins
    val ord = struct(loses(orderBy), orderBy, loses(tieBreaker), tieBreaker)
    val pick = if (descending) max_by(payload, ord) else min_by(payload, ord)
    val keyName = key.toString
    val outCols = df.columns.toSeq.map { c =>
      if (c == keyName) col("__dedup_key").as(c)
      else Quoting.ref("__winner", c).as(c)
    }
    df.groupBy(key.as("__dedup_key"))
      .agg(pick.as("__winner"))
      .select(outCols: _*)
  }

  /** Exact duplicate removal: one representative row (minimum id) per
    * distinct value of `on`. Hash-groupBy with partial aggregation —
    * the canonical exact-dedup for LLM corpora.
    */
  def exact(df: DataFrame, on: Column, idCol: Column): DataFrame = {
    Seq("__dedup_on", "__winner").foreach { r =>
      require(!df.columns.contains(r), s"column name $r is reserved by Dedup.exact")
    }
    val payload = struct(df.columns.toSeq.map(qcol): _*)
    df.groupBy(on.as("__dedup_on"))
      .agg(min_by(payload, idCol).as("__winner"))
      .select(col("__winner.*"))
  }
}
