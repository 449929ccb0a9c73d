package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative table-level data-quality expectations.
  *
  * The reference ships its table-level guarantees as a pytest suite
  * run AFTER the pipeline (reference tests/test_pipeline_motor.py:
  * output existence, OK/KO partitioning, dedup-by-key uniqueness,
  * schema conformance) — checks written imperatively against one
  * hardcoded dataflow. This operator turns that contract into ENGINE
  * metadata, the same move the reference itself makes for row-level
  * rules (pipeline/validator.py): declare the expectations in data,
  * evaluate them generically, emit one verdict row per expectation.
  * Row-level validation (graft.operators.Validator) routes individual
  * rows to OK/KO; expectations certify whole-TABLE invariants —
  * uniqueness, referential integrity, domains, bounds — that no
  * per-row predicate can express.
  *
  * Scale design: every expectation that is expressible as a
  * conditional aggregate over one scan (not_null, accepted_values,
  * range, row_count, unique) is FUSED into a single aggregation pass
  * per table — checking 50 expectations on a 100 TB table costs one
  * scan, not 50. Uniqueness rides the same pass as
  * `count(*) - count(DISTINCT key)` (partial-agg + Expand, never a
  * self-join). Referential integrity is the one shape that needs a
  * second table: a LEFT ANTI join per (table, ref) pair, broadcast
  * when the reference side is dimension-sized. Nothing collects to
  * the driver; the verdict table is one row per expectation.
  */
object Expectations {

  sealed trait ExpectationDef {
    def id: String
    def table: String
    def kind: String
    def columnName: String
  }

  /** count(*) - count(DISTINCT column) surplus rows. */
  final case class Unique(id: String, table: String, column: String)
      extends ExpectationDef {
    def kind = "unique"; def columnName: String = column
  }

  /** Rows where the column is NULL. */
  final case class NotNull(id: String, table: String, column: String)
      extends ExpectationDef {
    def kind = "not_null"; def columnName: String = column
  }

  /** Rows whose value is outside the declared domain (NULL counts as
    * outside — a domain is a closed world).
    */
  final case class AcceptedValues(id: String, table: String, column: String,
      values: Seq[String]) extends ExpectationDef {
    def kind = "accepted_values"; def columnName: String = column
  }

  /** Rows below min / above max (inclusive bounds; NULL is not a
    * range violation — declare NotNull separately if it matters).
    */
  final case class Bounds(id: String, table: String, column: String,
      min: Option[Double], max: Option[Double]) extends ExpectationDef {
    def kind = "bounds"; def columnName: String = column
  }

  /** Shortfall below a minimum row count (0 when satisfied). */
  final case class RowCountMin(id: String, table: String, minRows: Long)
      extends ExpectationDef {
    def kind = "row_count_min"; def columnName = ""
  }

  /** Non-NULL values with no match in refTable.refColumn (the dbt
    * `relationships` convention: NULLs are NotNull's business).
    */
  final case class ForeignKey(id: String, table: String, column: String,
      refTable: String, refColumn: String) extends ExpectationDef {
    def kind = "foreign_key"; def columnName: String = column
  }

  /** The fused one-scan violation aggregate for every scan-shaped
    * expectation on one table: one conditional-aggregate column per
    * expectation, evaluated in a single Aggregate over a single scan.
    * Exposed for ExpectationsSpec to pin the fusion.
    */
  private[graft] def scanViolations(df: DataFrame, defs: Seq[ExpectationDef]): DataFrame = {
    val aggs: Seq[Column] = defs.map {
      case Unique(id, _, c) =>
        (count(lit(1)) - count_distinct(col(c))).cast("long").as(id)
      case NotNull(id, _, c) =>
        count_if(col(c).isNull).cast("long").as(id)
      case AcceptedValues(id, _, c, vs) =>
        count_if(!coalesce(col(c).isInCollection(vs), lit(false))).cast("long").as(id)
      case Bounds(id, _, c, mn, mx) =>
        count_if(
          mn.map(col(c) < lit(_)).getOrElse(lit(false)) ||
          mx.map(col(c) > lit(_)).getOrElse(lit(false))).cast("long").as(id)
      case RowCountMin(id, _, minRows) =>
        greatest(lit(minRows) - count(lit(1)), lit(0L)).cast("long").as(id)
      case fk: ForeignKey =>
        throw new IllegalArgumentException(
          s"${fk.id}: foreign_key is join-shaped, not scan-shaped")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Orphan count for one referential expectation: values present in
    * the child column but absent from the referenced column. LEFT ANTI
    * join — Spark broadcasts the reference side when it is small
    * enough, which is the common dimension case.
    */
  private[graft] def orphanCount(child: DataFrame, ref: DataFrame,
      fk: ForeignKey): DataFrame =
    child.select(col(fk.column)).filter(col(fk.column).isNotNull)
      .join(ref.select(col(fk.refColumn).as(fk.column)), Seq(fk.column), "left_anti")
      .agg(count(lit(1)).cast("long").as(fk.id))

  /** Evaluate all expectations and emit the verdict table:
    * (expectation_id, table_name, kind, column_name, violations,
    * status). `resolve` maps a declared table name to its DataFrame.
    */
  def evaluate(spark: SparkSession, resolve: String => DataFrame,
      defs: Seq[ExpectationDef]): DataFrame = {
    require(defs.nonEmpty, "no expectations declared")
    require(defs.map(_.id).distinct.size == defs.size, "expectation ids must be unique")

    // one row of (id -> violations) per evaluation unit, then unpivot
    val (fks, scans) = defs.partition(_.isInstanceOf[ForeignKey])
    val scanRows: Seq[DataFrame] = scans.groupBy(_.table).toSeq.map {
      case (table, tdefs) => scanViolations(resolve(table), tdefs)
    }
    val fkRows: Seq[DataFrame] = fks.collect { case fk: ForeignKey =>
      orphanCount(resolve(fk.table), resolve(fk.refTable), fk)
    }
    val unpivoted: Seq[DataFrame] = (scanRows ++ fkRows).map { row =>
      val ids = row.columns
      val stackArgs = ids.map(id => s"'$id', `$id`").mkString(", ")
      row.selectExpr(
        s"stack(${ids.length}, $stackArgs) AS (expectation_id, violations)")
    }
    val violations = unpivoted.reduce(_.unionAll(_))

    import spark.implicits._
    val catalog = defs.map(d => (d.id, d.table, d.kind, d.columnName))
      .toDF("expectation_id", "table_name", "kind", "column_name")
    catalog.join(broadcast(violations), Seq("expectation_id"))
      .withColumn("status", when(col("violations") === 0, "pass").otherwise("fail"))
      .select("expectation_id", "table_name", "kind", "column_name",
        "violations", "status")
      .orderBy("expectation_id")
  }
}
