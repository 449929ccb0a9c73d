package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

/** Suite-wide window-shape audit (the VERDICT r10 "plan shape" gate):
  * across ALL SparkEntry queries, no Window node may sort a
  * corpus-scale row set in one task. Two rules over the optimized
  * logical plans, built with lineage cuts disabled so nothing hides
  * behind a LogicalRDD:
  *
  *  1. EMPTY partition spec (a global window) is allowed only for
  *     queries in [[WindowAuditSpec.globalAllow]], each with a
  *     documented input bound (e.g. a 10-row decile report).
  *  2. A partition spec consisting ONLY of known low-cardinality
  *     corpus dimensions (event_type/source/lang/l_returnflag) must
  *     sit above a DISTINCT-value axis — an Aggregate grouping by a
  *     strict superset of the partition keys — never over raw rows
  *     (the [[graft.operators.ValueAxis]]/[[graft.operators.RangeRank]]
  *     contract; RangeRank windows additionally carry the bucket
  *     column, which already takes them out of this rule's scope).
  *
  * This is the regression fence for the round-11 rewrites: reverting
  * any of q32/q58/q134/q140/q146/q148/q163/q164/q171/q172/q183/q187/
  * q194 (or q64/q137/q145) to a naive window breaks this spec.
  */
class WindowAuditSpec extends SparkSpec {

  /** Queries allowed to keep N global windows, with the bound that
    * makes each safe. Global windows above a literal LIMIT ≤ 1000 are
    * exempt automatically (provably bounded input). */
  private val globalAllow: Map[String, (Int, String)] = Map(
    "q172_pareto" -> ((2, "windows run over the 10-row decile report")),
    "q165_novelty_curve" -> ((1, "cumsum over the 10-row decile report")))

  private val lowCard = Set("event_type", "source", "lang", "l_returnflag")

  /** A global window whose input is statically bounded (Catalyst can
    * prove ≤ 1000 rows, e.g. through a LIMIT) is safe by
    * construction. */
  private def limitBounded(w: LWindow): Boolean =
    w.child.maxRows.exists(_ <= 1000L)

  test("no corpus-scale single-task window anywhere in the 195 plans") {
    val prev = Option(System.getProperty("graft.keepLineage"))
    System.setProperty("graft.keepLineage", "true")
    try {
      val dir = sf()
      val offenders = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val wins =
          try fn(spark, dir).queryExecution.optimizedPlan.collectWithSubqueries {
            case w: LWindow => w
          } catch {
            case e: Exception =>
              offenders += s"$name: failed to build plan: ${e.getMessage}"
              Seq.empty
          }
        val empties = wins.count(w => w.partitionSpec.isEmpty && !limitBounded(w))
        val allowed = globalAllow.get(name).map(_._1).getOrElse(0)
        if (empties > allowed)
          offenders += s"$name: $empties global window(s), $allowed allowed"
        wins.filter(_.partitionSpec.nonEmpty).foreach { w =>
          val attrs = w.partitionSpec.collect { case a: AttributeReference => a.name }
          val allLow = attrs.size == w.partitionSpec.size &&
            attrs.forall(lowCard.contains)
          if (allLow) {
            val axisBelow = w.child.collectFirst {
              case a: Aggregate
                if a.groupingExpressions.size > w.partitionSpec.size &&
                  attrs.forall(n => a.groupingExpressions.exists {
                    case ar: AttributeReference => ar.name == n
                    case _ => false
                  }) => a
            }.isDefined
            if (!axisBelow)
              offenders += s"$name: raw-row window keyed only by " +
                s"${attrs.mkString(",")} (no distinct-value axis below)"
          }
        }
      }
      assert(offenders.isEmpty,
        s"window-shape audit found:\n  ${offenders.mkString("\n  ")}")
    } finally prev match {
      case Some(v) => System.setProperty("graft.keepLineage", v)
      case None => System.clearProperty("graft.keepLineage")
    }
  }
}
