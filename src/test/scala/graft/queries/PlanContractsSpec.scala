package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Join, LocalRelation, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Suite-wide plan-shape contracts — ONE walk over every SparkEntry
  * query's optimized logical plan (lineage cuts disabled so nothing
  * hides behind a LogicalRDD), applying all structural rules:
  *
  * **Windows** (the round-10/11 gate): no Window node may sort a
  * corpus-scale row set in one task — a global window needs a
  * documented bounded input, and a raw-row window keyed only by
  * low-cardinality corpus dimensions must sit above a distinct-value
  * axis (the [[graft.operators.ValueAxis]]/[[graft.operators.RangeRank]]
  * contract).
  *
  * **Broadcasts** (the round-12 gate): every join side carrying an
  * explicit BROADCAST hint must have a statically bounded input —
  * Catalyst proves maxRows (a LIMIT, a global aggregate, a local
  * relation such as RangeRank's collected offset table), or every
  * leaf scan under it reads a bounded-domain dimension table
  * (nation = 25 rows, region = 5 at ANY scale factor), or the query
  * carries a [[PlanContractsSpec.broadcastAllow]] entry documenting
  * the bound. A hint on a linearly-scaling input (q11's customer,
  * q212's drop set, q173/q174's degree tables — the round-11 `weak`
  * set) fails here: the hint bypasses AQE's size check and OOMs at
  * 100 TB, while an un-hinted join lets the planner decide.
  *
  * **Cartesians**: a condition-less join is allowed only when one
  * side is provably tiny (maxRows ≤ 1000 — the 1-row argmax /
  * broadcast-scalar pattern) or the query documents the bound in
  * [[PlanContractsSpec.cartesianAllow]].
  */
class PlanContractsSpec extends SparkSpec {

  // ---------- window rules (moved from the former WindowAuditSpec) ----------

  /** Queries allowed to keep N global windows, with the bound that
    * makes each safe. Global windows above a literal LIMIT ≤ 1000 are
    * exempt automatically (provably bounded input). */
  private val globalAllow: Map[String, (Int, String)] = Map(
    "q172_pareto" -> ((2, "windows run over the 10-row decile report")),
    "q165_novelty_curve" -> ((1, "cumsum over the 10-row decile report")),
    "q228_shard_apportion" -> ((1,
      "largest-remainder rank over the <= |declared sources| (5) allocation rows")),
    "q243_survival" -> ((2,
      "ValueAxis cum/tot windows over the distinct-lifetime axis — bounded by the corpus DAY span (calendar domain), not row count")),
    "q256_cusum" -> ((4,
      "cum/index windows over the distinct-DAY axis (calendar domain — q243's argument); the axis subtree appears twice because the 1-row |CUSUM| peak crosses back over it")),
    "q259_autocorr" -> ((3,
      "the row_number index over the distinct-DAY axis (calendar domain); the series subtree appears three times — both lag-join sides and the 1-row denominator")),
    "q267_degree_profile" -> ((2,
      "ValueAxis cum/tot windows over the distinct-DEGREE axis — bounded by the degree domain, not node count")),
    "q268_heaps_curve" -> ((2,
      "cumulative occurrence/vocabulary windows over the 10-row decile axis")))

  private val lowCard = Set("event_type", "source", "lang", "l_returnflag")

  private def limitBounded(w: LWindow): Boolean =
    w.child.maxRows.exists(_ <= 1000L)

  private def windowOffenders(name: String, plan: LogicalPlan): Seq[String] = {
    val wins = plan.collectWithSubqueries { case w: LWindow => w }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val empties = wins.count(w => w.partitionSpec.isEmpty && !limitBounded(w))
    val allowed = globalAllow.get(name).map(_._1).getOrElse(0)
    if (empties > allowed)
      out += s"$name: $empties global window(s), $allowed allowed"
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
          out += s"$name: raw-row window keyed only by " +
            s"${attrs.mkString(",")} (no distinct-value axis below)"
      }
    }
    out.toSeq
  }

  // ---------- broadcast rules ----------

  /** Dimension tables whose row count is a bounded DOMAIN, not a
    * function of corpus size (TPC-H fixes them at every SF). */
  private val boundedDimFiles = Set("nation.parquet", "region.parquet")

  /** Explicit per-query broadcast allowances: number of hinted join
    * sides that are bounded for a reason the automatic rules cannot
    * see, with the documented bound. Keep this SHORT — every entry is
    * a claim reviewed by hand. */
  private val broadcastAllow: Map[String, (Int, String)] = Map(
    "q26_ngram_jaccard" ->
      ((2, "per-doc shingle sizes of the doc_id<500 eval slice — ≤500 rows by the literal filter")),
    "q28_knn_bruteforce" -> ((1, "query batch: literal vec_id<50 filter — ≤50 probe vectors")),
    "q79_knn_quantized" -> ((1, "query batch: literal vec_id<50 filter")),
    "q112_knn_ivfpq" -> ((1, "query batch: literal vec_id<50 filter")),
    "q138_hard_negatives" -> ((1, "query batch: literal vec_id<50 filter")),
    "q151_margin" ->
      ((4, "query batch (vec_id<50, hinted subtree reappears under both rank branches) and its per-query count table")),
    "q180_knn_classifier" -> ((1, "query batch: literal vec_id<50 filter")),
    "q91_hybrid_rerank" -> ((1, "query vectors of the literal BM25 query-id batch")),
    "q193_rank_correlation" -> ((1, "query vectors of the literal BM25 query-id batch (via q91)")),
    "q202_rrf_fusion" -> ((1, "query vectors of the literal BM25 query-id batch (via q91)")),
    "q188_bm25_prf" -> ((1, "union of the literal query terms and the per-query top-k PRF expansion")),
    "q99_expectations" -> ((1, "verdict table: one row per expectation — a union of global aggregates")),
    "q100_profile" -> ((1, "stack() of the 1-row distinct-count aggregate — |columns| rows")),
    "q132_dsir" -> ((1, "128-row DSIR hash-bucket weight table")),
    "q167_embedding_outliers" -> ((1, "2^8-cell LSH density table — bounded by the plane count")),
    "q181_centroid_classifier" -> ((1, "centroid table: |labels| x dim rows")),
    "q206_erasure_scope" -> ((1, "the erasure subject batch's order set — request-sized, not corpus-sized")),
    "q209_incremental_topk" ->
      ((2, "heavy-hitter candidate union (<= 64 exact era-A heavies + k*partitions batch MG survivors), hinted at both its join sites: the batch recount semi-join and the vocab merge")),
    "q222_winnow_recall" ->
      ((4, "q26's two doc_id<500 eval-slice size hints (≤500 rows by the literal filter), appearing twice: the exact-pair subtree feeds both the hit semi-join and the n_exact count")))

  /** Corpus dimensions with a bounded VALUE DOMAIN: an aggregate
    * grouped only by these produces a bounded row count at any corpus
    * size (shared with the window rule's lowCard set). */
  private def domainBoundedAgg(side: LogicalPlan): Boolean = {
    @scala.annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case u: org.apache.spark.sql.catalyst.plans.logical.Project => strip(u.child)
      case u: org.apache.spark.sql.catalyst.plans.logical.Filter => strip(u.child)
      case u: org.apache.spark.sql.catalyst.plans.logical.Sort => strip(u.child)
      case u: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => strip(u.child)
      case other => other
    }
    strip(side) match {
      case a: Aggregate =>
        a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
          case ar: AttributeReference => lowCard.contains(ar.name)
          case _ => false
        }
      // a join/product of bounded sides is bounded (e.g. a per-source
      // aggregate cross-joined with a global-aggregate scalar)
      case j: Join => broadcastBounded(j.left) && broadcastBounded(j.right)
      case _ => false
    }
  }

  /** Is this hinted build side statically bounded? */
  private def broadcastBounded(side: LogicalPlan): Boolean = {
    if (side.maxRows.exists(_ <= (1L << 20))) return true
    if (domainBoundedAgg(side)) return true
    val leaves = side.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case _: LocalRelation => true
      case r: LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.forall(p =>
              boundedDimFiles.exists(p.toString.endsWith(_)))
          case _ => false
        }
      case _ => false
    }
  }

  private def broadcastOffenders(name: String, plan: LogicalPlan): Seq[String] = {
    val unbounded = plan.collectWithSubqueries {
      case j: Join =>
        Seq(
          j.hint.leftHint.filter(_.strategy.contains(BROADCAST))
            .map(_ => j.left),
          j.hint.rightHint.filter(_.strategy.contains(BROADCAST))
            .map(_ => j.right)
        ).flatten.filterNot(broadcastBounded)
    }.flatten
    val allowed = broadcastAllow.get(name).map(_._1).getOrElse(0)
    if (unbounded.size > allowed)
      Seq(s"$name: ${unbounded.size} broadcast hint(s) on an input with no " +
        s"static bound ($allowed allowed): " +
        unbounded.map(_.nodeName).mkString(", "))
    else Seq.empty
  }

  // ---------- cartesian rules ----------

  /** Condition-less joins allowed per query, with the documented
    * input bound that keeps the product small. */
  private val cartesianAllow: Map[String, (Int, String)] = Map(
    "q155_langid_eval" -> ((1, "langs x langs confusion grid — both sides |langs|-bounded")),
    "q162_abtest" -> ((1, "two 1-row slices of the 2-arm A/B aggregate")),
    "q219_length_drift" ->
      ((1, "sources x 12 token-length buckets — both sides bounded-domain aggregates")),
    "q258_t_closeness" ->
      ((1, "equivalence classes (segments x balance bands — both bounded value domains) x the <=25-value nation domain")))

  private def cartesianOffenders(name: String, plan: LogicalPlan): Seq[String] = {
    val bad = plan.collectWithSubqueries {
      case j: Join if j.condition.isEmpty &&
        !j.left.maxRows.exists(_ <= 1000L) &&
        !j.right.maxRows.exists(_ <= 1000L) => j
    }
    val allowed = cartesianAllow.get(name).map(_._1).getOrElse(0)
    if (bad.size > allowed)
      Seq(s"$name: ${bad.size} condition-less join(s) with no tiny side " +
        s"($allowed allowed)")
    else Seq.empty
  }

  // ---------- the single walk ----------

  test("plan contracts hold for every query: windows, broadcasts, cartesians") {
    val prev = Option(System.getProperty("graft.keepLineage"))
    System.setProperty("graft.keepLineage", "true")
    try {
      val dir = sf()
      val offenders = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val planOpt =
          try Some(fn(spark, dir).queryExecution.optimizedPlan)
          catch {
            case e: Exception =>
              offenders += s"$name: failed to build plan: ${e.getMessage}"
              None
          }
        planOpt.foreach { plan =>
          offenders ++= windowOffenders(name, plan)
          offenders ++= broadcastOffenders(name, plan)
          offenders ++= cartesianOffenders(name, plan)
        }
      }
      assert(offenders.isEmpty,
        s"plan-contract audit found:\n  ${offenders.mkString("\n  ")}")
    } finally prev match {
      case Some(v) => System.setProperty("graft.keepLineage", v)
      case None => System.clearProperty("graft.keepLineage")
    }
  }
}
