package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[ValueAxis]] geometry against the naive raw-row windows it
  * replaces, on tie-heavy data: for every (group, value) the axis
  * row's (lo, hi, n, whi, wtot) must equal the per-row
  * cumulative-window values observed at that value's first/last row,
  * and value-at-rank must equal the raw-row rank lookup across rank
  * positions including every tie boundary.
  */
class ValueAxisSpec extends SparkSpec {

  private lazy val data = {
    import spark.implicits._
    (1 to 300).map { i =>
      val g = s"g${i % 2}"
      val v = (math.abs(s"a|$i".hashCode) % 5).toLong // heavy ties
      val w = (math.abs(s"w|$i".hashCode) % 4).toLong + 1
      (g, v, i.toLong, w)
    }.toDF("g", "v", "id", "w")
  }

  test("axis geometry equals the raw-row cumulative windows") {
    val ax = ValueAxis.axis(data, Seq("g"), "v", weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n"),
          r.getAs[Long]("whi"), r.getAs[Long]("wtot"))))
      .toMap
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    val raw = data
      .withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("cumw", sum(col("w")).over(w))
      .withColumn("wtot", sum(col("w")).over(tot))
      .collect()
    raw.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rows) =>
      val (lo, hi, n, whi, wtot) = ax(k)
      assert(rows.map(_.getAs[Int]("rnk")).max.toLong === hi, s"$k hi")
      assert(rows.map(_.getAs[Int]("rnk")).min.toLong === lo + 1, s"$k lo")
      assert(rows.head.getAs[Long]("n") === n, s"$k n")
      assert(rows.map(_.getAs[Long]("cumw")).max === whi, s"$k whi")
      assert(rows.head.getAs[Long]("wtot") === wtot, s"$k wtot")
    }
  }

  test("value-at-rank equals the raw-row rank lookup at and around tie boundaries") {
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = data.withColumn("rnk", row_number().over(w))
      .select("g", "rnk", "v").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    // probe every boundary rank (first/last of each tie run) plus ends
    val ax = ValueAxis.axis(data, Seq("g"), "v")
    val boundaries = ax.select("lo", "hi").collect()
      .flatMap(r => Seq(r.getLong(0) + 1, r.getLong(1))).distinct.sorted
    val aggs = boundaries.map(k =>
      ValueAxis.valueAtRank("v", lit(k)).as(s"k_$k"))
    val got = ax.groupBy("g").agg(aggs.head, aggs.tail: _*).collect()
    got.foreach { r =>
      val g = r.getString(0)
      boundaries.zipWithIndex.foreach { case (k, i) =>
        want.get((g, k)).foreach { exp =>
          assert(r.getLong(i + 1) === exp, s"g=$g rank=$k") }
      }
    }
  }
}
