package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * Ties on the primary key share a bucket (the bucket function can't
  * see tiebreak columns), so a single value owning a giant share of a
  * group still bounds that bucket by the value's multiplicity — the
  * same bound a distinct-value axis has. All sort keys participate in
  * the within-bucket ordering, so the produced rank equals the
  * global-window rank exactly whenever `keys` is a total order.
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

  private val B = "__rr_b"
  private val OFF = "__rr_off"
  private val WOFF = "__rr_woff"

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
      buckets: Int = 0): DataFrame = {
    require(keys.nonEmpty, "RangeRank needs at least one sort key")
    val spark = df.sparkSession
    val b = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = graft.Lineage.cut(df)
    val prim = keys.head
    val primD = col(prim.name).cast("double")

    // 1. boundary probe (approximate is fine — results never depend
    //    on where the boundaries land, only balance does)
    val probs = (1 until b).map(_.toDouble / b).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else base.select(primD.as("__rr_p")).na.drop("any", Seq("__rr_p"))
        .stat.approxQuantile("__rr_p", probs, 0.01)
        .distinct.sorted

    // 2. bucket tag: #boundaries strictly before this row in sort order
    val bucketExpr = bounds.foldLeft(lit(0)) { (acc, t) =>
      acc + (if (!prim.desc) when(primD > lit(t), 1).otherwise(0)
             else when(primD < lit(t), 1).otherwise(0))
    }
    val tagged = base.withColumn(B, bucketExpr)
    val keyCols = groupCols :+ B

    // 3. per-(group, bucket) stats → rank/weight offsets as literals
    val aggs = count(lit(1)).cast("long").as("__rr_c") +:
      weight.toSeq.map(w => coalesce(sum(col(w.weightCol)), lit(0L))
        .cast("long").as("__rr_w"))
    val stats = tagged.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val statRows = stats.collect()
    val g = groupCols.length
    val offRows: Seq[Row] = statRows
      .groupBy(r => r.toSeq.take(g))
      .valuesIterator.flatMap { rs =>
        val sorted = rs.sortBy(_.getInt(g))
        val n = sorted.map(_.getLong(g + 1)).sum
        val wtot = if (weight.isDefined) sorted.map(_.getLong(g + 2)).sum else 0L
        var roff = 0L
        var woff = 0L
        sorted.map { r =>
          val vals = r.toSeq.take(g + 1) ++ Seq(roff, n) ++
            (if (weight.isDefined) Seq(woff, wtot) else Nil)
          roff += r.getLong(g + 1)
          if (weight.isDefined) woff += r.getLong(g + 2)
          Row.fromSeq(vals)
        }
      }.toSeq
    val offSchema = StructType(
      stats.schema.fields.take(g + 1) ++
        Seq(StructField(OFF, LongType, nullable = false),
          StructField(nCol, LongType, nullable = false)) ++
        weight.toSeq.flatMap(w =>
          Seq(StructField(WOFF, LongType, nullable = false),
            StructField(w.totCol, LongType, nullable = false))))
    val offDf = spark.createDataFrame(
      new java.util.ArrayList[Row](offRows.asJava), offSchema)

    // 4. local rank within (group, bucket) + broadcast offsets
    val order = keys.map(k => if (k.desc) col(k.name).desc else col(k.name).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    var out = tagged.join(broadcast(offDf), keyCols)
      .withColumn(rankCol, row_number().over(w).cast("long") + col(OFF))
    weight.foreach { wt =>
      out = out.withColumn(wt.cumCol,
        sum(col(wt.weightCol)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long") + col(WOFF))
    }
    out.drop(B, OFF, WOFF)
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
