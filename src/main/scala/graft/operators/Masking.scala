package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative column-level masking policies — the dynamic-data-
  * masking layer of the governance family (q99 certifies tables,
  * q100 profiles them, this rewrites what a consumer is allowed to
  * see). The reference scrubs row CONTENT with regex rules
  * (pipeline/validator.py routes; ScrubQueries.q50 redacts); masking
  * is the column-shaped complement: the policy names a column and a
  * strategy, and the engine rewrites every read through it.
  *
  * Scale design: a mask set compiles to ONE projection — zero extra
  * passes, zero shuffles, fully codegen'd, pushdown-transparent
  * (filters on unmasked columns still reach the scan). Hash masking
  * uses salted md5: deterministic pseudonyms, so masked tables stay
  * JOINABLE on the masked key across tables masked with the same
  * salt — the property that makes masked analytics possible at all.
  */
object Masking {

  sealed trait MaskDef { def column: String }

  /** Salted-md5 pseudonym: deterministic, join-preserving, not
    * reversible without the salt. NULL stays NULL.
    */
  final case class HashMask(column: String, salt: String) extends MaskDef

  /** Keep the last `keepLast` characters, star the rest (shorter
    * values pass through unstarred — there is nothing left to hide
    * that the length itself doesn't reveal).
    */
  final case class PartialMask(column: String, keepLast: Int) extends MaskDef

  /** Replace with NULL (type-preserving). */
  final case class NullifyMask(column: String) extends MaskDef

  /** Numeric generalization: floor to a bucket multiple — the
    * k-anonymity move for continuous values.
    */
  final case class BucketMask(column: String, width: Long) extends MaskDef

  private def maskColumn(d: MaskDef, c: Column,
      orig: org.apache.spark.sql.types.DataType): Column = d match {
    case HashMask(_, salt)    => md5(concat(lit(s"$salt|"), c))
    case PartialMask(_, keep) =>
      // shorter-than-keep guarded explicitly: Spark's negative-start
      // substring and DuckDB's right() disagree on strings shorter
      // than the window, so neither is used there
      when(length(c) <= keep, c).otherwise(
        concat(repeat(lit("*"), (length(c) - keep).cast("int")),
          substring(c, -keep, keep)))
    case NullifyMask(_)       => lit(null).cast(orig)
    case BucketMask(_, w)     =>
      (floor(c.cast("double") / w.toDouble) * w).cast("bigint")
  }

  /** Apply the policy: one projection, same column order, masked
    * where declared. Unknown policy columns fail fast (a policy that
    * silently no-ops is a leak, not a convenience).
    */
  def apply(df: DataFrame, defs: Seq[MaskDef]): DataFrame = {
    val byCol = defs.map(d => d.column -> d).toMap
    require(byCol.size == defs.size, "one mask per column")
    val missing = byCol.keySet -- df.columns.toSet
    require(missing.isEmpty, s"mask policy names absent columns: $missing")
    df.select(df.columns.map { name =>
      byCol.get(name) match {
        case Some(d) => maskColumn(d, col(name), df.schema(name).dataType).as(name)
        case None    => col(name)
      }
    }: _*)
  }
}
