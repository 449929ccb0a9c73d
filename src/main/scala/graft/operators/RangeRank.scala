package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType, StructField, StructType}

/** Exact distributed rank / ntile without a single-task sort.
  *
  * The naive `row_number() OVER (ORDER BY …)` (or `PARTITION BY` a
  * handful of values) funnels the whole input through one task's
  * sort — fine at sf1, a cliff at 100 TB. This helper computes the
  * SAME exact per-group rank, group count, and (optionally) running
  * weighted sum with the classic two-pass range-partitioned plan:
  *
  *  1. probe ~`buckets` approximate quantile boundaries of the
  *     primary sort key (one cheap pass; placement accuracy only
  *     affects balance, never results);
  *  2. tag each row with its boundary bucket — a PURE FUNCTION of the
  *     row's key against literal boundaries, so re-computation of the
  *     plan can never disagree with itself (no checkpoint needed for
  *     correctness; [[graft.Lineage.cut]] is applied for speed only);
  *  3. aggregate per-(group, bucket) row counts / weight sums —
  *     ≤ |groups|·buckets rows — collect, and turn them into rank
  *     and weight OFFSETS per bucket plus per-group totals;
  *  4. rank within (group, bucket) — every window partition now
  *     carries ~1/buckets of a group — and add the broadcast offset.
  *
  * Ties on the primary key share a bucket by default, so a single
  * value owning a giant share of a group bounds that bucket by the
  * value's multiplicity. When the boundary probe detects massive ties
  * (fewer than buckets/4 distinct boundaries) AND a numeric secondary
  * sort key exists, the heavy values are SUB-BUCKETED on secondary-key
  * quantiles — each pair boundary `(t, s)` contributes "row sorts
  * strictly after (t, s) lexicographically", which is monotone in the
  * full sort order, so ranks are unchanged and the all-equal-primary
  * degenerate case rebalances instead of collapsing to one task.
  * All sort keys participate in the within-bucket ordering, so the
  * produced rank equals the global-window rank exactly whenever
  * `keys` is a total order.
  *
  * NULL handling matches the window defaults the operator replaces:
  * NULL group values form their own group (the offset join is
  * null-safe, `<=>`); a NULL primary key buckets first for asc keys
  * (`asc_nulls_first`) and last for desc keys (`desc` = nulls last).
  *
  * [[rankMulti]] computes SEVERAL independent rankings of the same
  * input (e.g. RFM's three quintiles) with ONE boundary-probe pass
  * (multi-column approxQuantile) and ONE offset-stats pass (grouping
  * sets) instead of per-ranking passes — the data-width passes are
  * shared; only the per-ranking window shuffles remain.
  */
object RangeRank {
  import scala.jdk.CollectionConverters._

  /** One sort key; `name` must be a column of the input. The FIRST
    * key drives bucketing and must be numeric (or castable to double
    * monotonically — longs/decimals/doubles all qualify). */
  final case class Key(name: String, desc: Boolean = false)

  /** Optional running-weight request: input weight column, output
    * running-sum column (frame = unbounded preceding → current row),
    * output group-total column. */
  final case class Weight(weightCol: String, cumCol: String, totCol: String)

  /** One ranking request for [[rankMulti]]. */
  final case class Spec(
      keys: Seq[Key],
      rankCol: String,
      nCol: String,
      weight: Option[Weight] = None)

  /** Largest magnitude below which long → double is injective (2^53).
    * The tie-skew fallback compares the primary key through its double
    * cast (`afterPair` tests `pD <=> lit(t)`); two DISTINCT values that
    * collide in double would be treated as tied and split across
    * sub-buckets by the secondary key — non-monotonic in the true sort
    * order, hence wrong ranks. Sub-bucketing is therefore gated to
    * boundary values whose whole double-neighbourhood is exact:
    * byte/short/int/float/double primaries always (the cast is
    * injective on the full domain), long primaries only for |t| < 2^53,
    * decimals and everything else never (fractional decimals can
    * collide at any magnitude). A gated-off value keeps the
    * pre-existing primary-only bucketing, which is order-safe for any
    * monotone (possibly lossy) cast. */
  private val LongExactMax = 9007199254740992.0
  private def tieExactGate(dt: DataType): Double => Boolean = dt match {
    case ByteType | ShortType | IntegerType | FloatType | DoubleType =>
      _ => true
    case LongType => t => math.abs(t) < LongExactMax
    case _ => _ => false
  }

  private def bName(i: Int) = s"__rr_b$i"
  private def offName(i: Int) = s"__rr_off$i"
  private def woffName(i: Int) = s"__rr_woff$i"
  private val OPFX = "__rr_o_"

  /** Adds `rankCol` (1-based, long) and `nCol` (group size, long) —
    * and, when `weight` is set, its running/total columns — to `df`,
    * ranked by `keys` within each distinct value of `groupCols`.
    * Result columns and values are identical to the single-window
    * form `row_number().over(Window.partitionBy(groupCols).orderBy(keys))`.
    */
  def rank(
      df: DataFrame,
      groupCols: Seq[String],
      keys: Seq[Key],
      rankCol: String,
      nCol: String,
      weight: Option[Weight] = None,
      buckets: Int = 0): DataFrame =
    rankMulti(df, groupCols, Seq(Spec(keys, rankCol, nCol, weight)), buckets)

  /** Row sorts strictly after boundary `t` under this key's order.
    * NULL-correct for the window's default null placement: asc →
    * nulls FIRST → never after any boundary; desc → nulls LAST →
    * after every boundary. Always returns non-null 0/1. */
  private def afterBound(keyD: Column, desc: Boolean, t: Double): Column =
    if (!desc) when(keyD > lit(t), lit(1)).otherwise(lit(0))
    else when(keyD.isNull || keyD < lit(t), lit(1)).otherwise(lit(0))

  /** Row sorts strictly after the PAIR boundary `(t, s)` under the
    * lexicographic (primary, secondary) order — monotone in the full
    * sort order, so sub-buckets never reorder ranks. */
  private def afterPair(
      pD: Column, pDesc: Boolean, t: Double,
      sD: Column, sDesc: Boolean, s: Double): Column =
    when(afterBound(pD, pDesc, t) === 1, lit(1))
      .otherwise(when((pD <=> lit(t)) && afterBound(sD, sDesc, s) === 1, lit(1))
        .otherwise(lit(0)))

  /** Bucket-tag expressions for each spec: #boundary objects strictly
    * before the row in sort order. Exposed package-private so the
    * balance spec can audit bucket sizes directly. ONE probe job total:
    * primary AND (numeric) secondary keys share the same multi-column
    * approxQuantile pass, and degenerate specs sub-bucket their heavy
    * tie values on the secondary's GLOBAL quantiles — sub-bounds steer
    * only bucket BALANCE, never rank values (afterPair is order-exact
    * for any boundary), and in the all-equal-primary case the global
    * secondary quantiles ARE the conditional ones. */
  private[graft] def bucketExprs(
      base: DataFrame,
      specs: Seq[Spec],
      b: Int): Seq[Column] = {
    val probs = (1 until b).map(_.toDouble / b).toArray
    val primNames = specs.indices.map(i => s"__rr_p$i")
    // numeric secondary key per spec, probed alongside the primaries
    // so the tie-skew fallback never needs a second probe job
    val secKeys: Seq[Option[Key]] = specs.map(_.keys.drop(1).headOption
      .filter(k => base.schema.find(_.name == k.name)
        .exists(_.dataType.isInstanceOf[NumericType])))
    val secNames = specs.indices.map(i => s"__rr_s$i")
    val probeCols =
      specs.zipWithIndex.map { case (s, i) =>
        col(s.keys.head.name).cast("double").as(primNames(i))
      } ++
        secKeys.zipWithIndex.collect { case (Some(k), i) =>
          col(k.name).cast("double").as(secNames(i))
        }
    val probeNames = primNames ++
      secKeys.zipWithIndex.collect { case (Some(_), i) => secNames(i) }
    val probed = base.select(probeCols: _*)
    // one pass for ALL keys (nulls ignored per column)
    val allBounds: Array[Array[Double]] =
      if (probs.isEmpty) Array.fill(probeNames.length)(Array.empty[Double])
      else probed.stat.approxQuantile(probeNames.toArray, probs, 0.01)
    val secBounds: Map[Int, Array[Double]] =
      secKeys.zipWithIndex.collect { case (Some(_), i) => i }
        .zipWithIndex.map { case (specIdx, pos) =>
          specIdx -> allBounds(specs.length + pos).filterNot(_.isNaN)
            .distinct.sorted
        }.toMap

    specs.zipWithIndex.map { case (spec, i) =>
      val prim = spec.keys.head
      val pD = col(prim.name).cast("double")
      val raw = allBounds(i).filterNot(_.isNaN)
      val distinctBounds = raw.distinct.sorted
      val mult = raw.groupBy(identity).map { case (v, a) => v -> a.length }

      // tie-skew fallback: massive primary ties + a numeric secondary
      // key → split each heavy value's band on the secondary's global
      // quantiles, one evenly-spaced pick per lost boundary
      val secOpt = secKeys(i)
      val tieExact = tieExactGate(
        base.schema.find(_.name == prim.name).map(_.dataType).orNull)
      val heavy = mult.filter { case (v, m) => m > 1 && tieExact(v) }
      val subBounds: Map[Double, Array[Double]] =
        if (distinctBounds.length < b / 4 && heavy.nonEmpty && secOpt.isDefined) {
          val secQ = secBounds.getOrElse(i, Array.empty[Double])
          if (secQ.isEmpty) Map.empty
          else heavy.map { case (v, m) =>
            v -> (1 to m).map(j => secQ((j * secQ.length) / (m + 1)))
              .toArray.distinct.sorted
          }
        } else Map.empty

      val terms: Seq[Column] =
        distinctBounds.toSeq.map(t => afterBound(pD, prim.desc, t)) ++
          subBounds.toSeq.flatMap { case (t, ss) =>
            val sec = secOpt.get
            val sD = col(sec.name).cast("double")
            ss.map(s => afterPair(pD, prim.desc, t, sD, sec.desc, s))
          }
      terms.foldLeft(lit(0))(_ + _)
    }
  }

  /** Computes EVERY ranking in `specs` over the same input with one
    * probe pass and one stats pass (see class doc). Column semantics
    * per spec are exactly [[rank]]'s. */
  def rankMulti(
      df: DataFrame,
      groupCols: Seq[String],
      specs: Seq[Spec],
      buckets: Int = 0): DataFrame = {
    require(specs.nonEmpty && specs.forall(_.keys.nonEmpty),
      "RangeRank needs at least one spec with at least one sort key")
    val outNames = specs.flatMap(s =>
      Seq(s.rankCol, s.nCol) ++ s.weight.toSeq.flatMap(w => Seq(w.cumCol, w.totCol)))
    require(outNames.distinct.length == outNames.length,
      s"RangeRank output columns collide across specs: ${outNames.mkString(", ")}")
    val clash = outNames.filter(df.columns.contains)
    require(clash.isEmpty,
      s"RangeRank output columns already exist on the input: ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val b = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = graft.Lineage.cut(df)
    val g = groupCols.length

    // 1–2. shared boundary probe → per-spec bucket tag
    val bexprs = bucketExprs(base, specs, b)
    val tagged = specs.indices.foldLeft(base)((d, i) =>
      d.withColumn(bName(i), bexprs(i)))

    // 3. ONE per-(group, bucket) stats pass. Single spec → plain
    //    groupBy; several → grouping sets (one set per spec, each
    //    output row has exactly its spec's bucket column non-null).
    val wIdxBySpec: Map[Int, Int] = {
      var next = g + specs.length + 1
      specs.zipWithIndex.collect { case (s, i) if s.weight.isDefined =>
        val idx = next; next += 1; i -> idx
      }.toMap
    }
    val aggExprs: Seq[Column] =
      count(lit(1)).cast("long").as("__rr_c") +:
        specs.zipWithIndex.collect { case (s, i) if s.weight.isDefined =>
          coalesce(sum(col(s.weight.get.weightCol)), lit(0L))
            .cast("long").as(s"__rr_w$i")
        }
    val gAll = groupCols ++ specs.indices.map(bName)
    val grouped =
      if (specs.length == 1) tagged.groupBy(gAll.map(col): _*)
      else tagged.groupingSets(
        specs.indices.map(i => (groupCols :+ bName(i)).map(col)),
        gAll.map(col): _*)
    val stats = grouped.agg(aggExprs.head, aggExprs.tail: _*)
    val statRows = stats.collect()

    // 4. per spec: offsets → null-safe broadcast join → local window
    var out = tagged
    specs.zipWithIndex.foreach { case (spec, i) =>
      val bIdx = g + i
      val cIdx = g + specs.length
      val mine = statRows.filter(r => !r.isNullAt(bIdx))
      val offRows: Seq[Row] = mine
        .groupBy(r => r.toSeq.take(g))
        .valuesIterator.flatMap { rs =>
          val sorted = rs.sortBy(_.getInt(bIdx))
          val n = sorted.map(_.getLong(cIdx)).sum
          val wtot = spec.weight.map(_ =>
            sorted.map(_.getLong(wIdxBySpec(i))).sum).getOrElse(0L)
          var roff = 0L
          var woff = 0L
          sorted.map { r =>
            // Seq[Any], NOT Seq(...): plain Seq would unify Int+Long
            // to Seq[Long] and silently widen the Int bucket value,
            // corrupting the IntegerType slot of the local relation
            val vals = r.toSeq.take(g) ++
              Seq[Any](r.getInt(bIdx), roff, n) ++
              (if (spec.weight.isDefined) Seq[Any](woff, wtot) else Nil)
            roff += r.getLong(cIdx)
            if (spec.weight.isDefined) woff += r.getLong(wIdxBySpec(i))
            Row.fromSeq(vals)
          }
        }.toSeq
      val offSchema = StructType(
        stats.schema.fields.take(g) ++
          Seq(StructField(bName(i), IntegerType, nullable = false),
            StructField(offName(i), LongType, nullable = false),
            StructField(spec.nCol, LongType, nullable = false)) ++
          spec.weight.toSeq.flatMap(w =>
            Seq(StructField(woffName(i), LongType, nullable = false),
              StructField(w.totCol, LongType, nullable = false))))
      val offDf = spark.createDataFrame(
        new java.util.ArrayList[Row](offRows.asJava), offSchema)

      // null-safe (<=>) join: a NULL group value is its own group in
      // the window form this replaces, so it must match its offset
      // row instead of being dropped by plain equality
      val keyNames = groupCols :+ bName(i)
      val offRenamed = keyNames.foldLeft(offDf)((d, c) =>
        d.withColumnRenamed(c, OPFX + c))
      val cond = keyNames.map(c => col(c) <=> col(OPFX + c)).reduce(_ && _)
      out = out.join(broadcast(offRenamed), cond)
        .drop(keyNames.map(OPFX + _): _*)

      val order = spec.keys.map(k =>
        if (k.desc) col(k.name).desc else col(k.name).asc)
      val w = Window.partitionBy(keyNames.map(col): _*).orderBy(order: _*)
      out = out.withColumn(spec.rankCol,
        row_number().over(w).cast("long") + col(offName(i)))
      spec.weight.foreach { wt =>
        out = out.withColumn(wt.cumCol,
          sum(col(wt.weightCol)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long") + col(woffName(i)))
      }
      out = out.drop(bName(i), offName(i), woffName(i))
    }
    out
  }

  /** `NTILE(k)`-equivalent tile from an exact rank and group size
    * (SQL semantics: the first `n mod k` tiles get `n div k + 1`
    * rows). Lets a [[rank]] result replace an ntile window without
    * changing a single output value. */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column =
    expr(
      s"""CASE WHEN $rankCol <= ($nCol % $k) * ($nCol DIV $k + 1)
         | THEN ($rankCol - 1) DIV ($nCol DIV $k + 1) + 1
         | ELSE ($nCol % $k)
         |   + ($rankCol - 1 - ($nCol % $k) * ($nCol DIV $k + 1))
         |     DIV ($nCol DIV $k) + 1
         |END""".stripMargin.replace("\n", " ")).cast("int")
}
