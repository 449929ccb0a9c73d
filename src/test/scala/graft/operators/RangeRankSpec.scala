package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[RangeRank]] to the single-window semantics it replaces:
  * for any input, rank/n/cumw/wtot must be BIT-IDENTICAL to
  * `row_number()/count/sum OVER (PARTITION BY g ORDER BY …)`, for any
  * bucket count — boundary placement may shift work, never answers.
  * Deliberately adversarial data: heavy ties on the primary key (so
  * ties straddle bucket boundaries), negative values, a group with a
  * single row, and bucket counts from degenerate (1) to larger than
  * the distinct-value count.
  */
class RangeRankSpec extends SparkSpec {
  import RangeRank.Key

  // 400 rows, 3 groups, primary values drawn from just 7 distinct
  // longs (heavy ties), deterministic content-hash "randomness"
  private lazy val data: DataFrame = {
    import spark.implicits._
    (1 to 400).map { i =>
      val g = s"g${i % 3}"
      val v = (math.abs(s"v|$i".hashCode) % 7) - 3L
      val wgt = (math.abs(s"w|$i".hashCode) % 5) + 1L
      (g, v, i.toLong, wgt)
    }.toDF("g", "v", "id", "wgt")
  }

  private def naive(df: DataFrame, group: Seq[String], desc: Boolean): DataFrame = {
    val order = Seq(if (desc) col("v").desc else col("v").asc, col("id").asc)
    val w = Window.partitionBy(group.map(col): _*).orderBy(order: _*)
    val tot = Window.partitionBy(group.map(col): _*)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(tot).cast("long"))
      .withColumn("cumw", sum(col("wgt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .withColumn("wtot", sum(col("wgt")).over(tot).cast("long"))
  }

  private def assertSame(group: Seq[String], desc: Boolean, buckets: Int): Unit = {
    val got = RangeRank.rank(data, group,
        Seq(Key("v", desc), Key("id")), "rnk", "n",
        weight = Some(RangeRank.Weight("wgt", "cumw", "wtot")),
        buckets = buckets)
      .select("g", "id", "rnk", "n", "cumw", "wtot")
    val want = naive(data, group, desc).select("g", "id", "rnk", "n", "cumw", "wtot")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"group=$group desc=$desc buckets=$buckets diverged from the window form")
  }

  test("global rank matches the unpartitioned window for every bucket count") {
    for (b <- Seq(1, 4, 16)) assertSame(Nil, desc = false, buckets = b)
  }

  test("descending global rank matches (ties split across buckets)") {
    assertSame(Nil, desc = true, buckets = 8)
  }

  test("grouped rank + running weight match the partitioned windows") {
    for (b <- Seq(1, 5)) assertSame(Seq("g"), desc = false, buckets = b)
    assertSame(Seq("g"), desc = true, buckets = 6)
  }

  test("ntileFromRank reproduces NTILE(k) exactly, including n < k and remainders") {
    import spark.implicits._
    for (n <- Seq(1, 3, 7, 10, 23); k <- Seq(2, 3, 5, 10)) {
      val df = (1 to n).map(i => (i.toLong, n.toLong)).toDF("rnk", "n")
      val got = df.select(col("rnk"),
        RangeRank.ntileFromRank("rnk", "n", k).as("t")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = (1 to n).map(i => (i.toLong,
        ntileRef(i, n, k))).toMap
      assert(got === want, s"n=$n k=$k")
      // and against Spark's own NTILE on the same ordering
      val sparkTile = df.select(col("rnk"),
        ntile(k).over(Window.orderBy("rnk")).as("t")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === sparkTile, s"n=$n k=$k vs Spark ntile")
    }
  }

  /** Reference NTILE: first (n mod k) tiles get ceil(n/k) rows. */
  private def ntileRef(rank: Int, n: Int, k: Int): Int = {
    val q = n / k; val r = n % k
    if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
    else r + (rank - 1 - r * (q + 1)) / math.max(q, 1) + 1
  }

  test("all-equal primary keys stay exact (sub-bucketed on the secondary key)") {
    import spark.implicits._
    val flat = (1 to 100).map(i => ("g", 7L, i.toLong, 2L)).toDF("g", "v", "id", "wgt")
    val got = RangeRank.rank(flat, Nil, Seq(Key("v"), Key("id")), "rnk", "n",
        weight = Some(RangeRank.Weight("wgt", "cumw", "wtot")), buckets = 16)
      .select("id", "rnk", "n", "cumw", "wtot").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    (1 to 100).foreach { i =>
      assert(got(i.toLong) === ((i.toLong, 100L, 2L * i, 200L)), s"id=$i")
    }
  }

  test("empty input yields empty output with the rank columns present") {
    val empty = data.filter(lit(false))
    val out = RangeRank.rank(empty, Seq("g"), Seq(Key("v"), Key("id")), "rnk", "n")
    assert(out.columns.contains("rnk") && out.columns.contains("n"))
    assert(out.count() === 0)
  }

  test("all-equal primary + numeric secondary rebalances: no bucket > 2x ideal") {
    import spark.implicits._
    val n = 2000
    val b = 16
    val flat = (1 to n).map(i => ("g", 7L, i.toLong, 2L)).toDF("g", "v", "id", "wgt")
    val spec = RangeRank.Spec(Seq(Key("v"), Key("id")), "rnk", "n")
    val bex = RangeRank.bucketExprs(flat, Seq(spec), b)
    val sizes = flat.withColumn("__b", bex.head)
      .groupBy("__b").count().collect().map(_.getLong(1))
    val ideal = n.toDouble / b
    assert(sizes.length > 1, "tie-skew fallback did not split the all-equal band")
    assert(sizes.max <= 2 * ideal,
      s"bucket sizes ${sizes.sorted.mkString(",")} exceed 2x ideal $ideal")
  }

  test("NULL group values keep their rows and rank as their own group") {
    import spark.implicits._
    val rows = (1 to 60).map { i =>
      val g: String = if (i % 3 == 0) null else s"g${i % 2}"
      (g, (i % 5).toLong, i.toLong, 1L)
    }.toDF("g", "v", "id", "wgt")
    val got = RangeRank.rank(rows, Seq("g"), Seq(Key("v"), Key("id")), "rnk", "n",
      weight = Some(RangeRank.Weight("wgt", "cumw", "wtot")), buckets = 4)
    assert(got.count() === 60, "rows with a NULL group value were dropped")
    val want = naive(rows, Seq("g"), desc = false)
      .select("g", "id", "rnk", "n", "cumw", "wtot")
    val gotSel = got.select("g", "id", "rnk", "n", "cumw", "wtot")
    assert(gotSel.exceptAll(want).isEmpty && want.exceptAll(gotSel).isEmpty,
      "NULL-group ranks diverged from the window form")
  }

  test("NULL primary keys follow the window's null placement (asc first, desc last)") {
    import spark.implicits._
    val rows = (1 to 40).map { i =>
      val v: java.lang.Long = if (i % 7 == 0) null else (i % 4).toLong
      ("g", v, i.toLong, 1L)
    }.toDF("g", "v", "id", "wgt")
    for (desc <- Seq(false, true)) {
      val got = RangeRank.rank(rows, Nil, Seq(Key("v", desc), Key("id")),
          "rnk", "n", buckets = 8)
        .select("id", "rnk", "n")
      val order = Seq(if (desc) col("v").desc else col("v").asc, col("id").asc)
      val w = Window.orderBy(order: _*)
      val want = rows
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast("long"))
        .select("id", "rnk", "n")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"desc=$desc NULL primary ranks diverged from the window form")
    }
  }

  test("long primaries beyond 2^53 never sub-bucket: double-colliding keys rank exactly") {
    import spark.implicits._
    // 2^53 and 2^53+1 are DISTINCT longs with the SAME double image;
    // the pre-gate fallback would treat them as tied and split the band
    // by the secondary key, reordering ranks. The gate must keep the
    // primary-only bucketing (order-safe under any monotone cast).
    val v1 = 9007199254740992L // 2^53
    val v2 = 9007199254740993L // 2^53 + 1: double(v2) == double(v1)
    val rows = (1 to 100).map { i =>
      val v = if (i % 10 == 0) v2 else v1 // heavy tie on v1, minority v2
      ("g", v, (101 - i).toLong, 1L)      // secondary DESCENDS as v2 appears
    }.toDF("g", "v", "id", "wgt")
    val got = RangeRank.rank(rows, Nil, Seq(Key("v"), Key("id")), "rnk", "n",
        buckets = 16)
      .select("id", "rnk", "n")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val want = rows
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .select("id", "rnk", "n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "ranks over double-colliding long keys diverged from the window form")
  }

  test("rankMulti rejects colliding or pre-existing output column names") {
    val dup = Seq(
      RangeRank.Spec(Seq(Key("v"), Key("id")), "r1", "shared"),
      RangeRank.Spec(Seq(Key("wgt"), Key("id")), "r2", "shared"))
    val e1 = intercept[IllegalArgumentException] {
      RangeRank.rankMulti(data, Nil, dup, buckets = 4)
    }
    assert(e1.getMessage.contains("collide"), e1.getMessage)
    val onInput = Seq(RangeRank.Spec(Seq(Key("v"), Key("id")), "rnk", "wgt"))
    val e2 = intercept[IllegalArgumentException] {
      RangeRank.rankMulti(data, Nil, onInput, buckets = 4)
    }
    assert(e2.getMessage.contains("already exist"), e2.getMessage)
  }

  test("rankMulti equals three independent rank calls over the same input") {
    val specs = Seq(
      RangeRank.Spec(Seq(Key("v"), Key("id")), "r1", "n1"),
      RangeRank.Spec(Seq(Key("v", desc = true), Key("id")), "r2", "n2"),
      RangeRank.Spec(Seq(Key("wgt"), Key("id")), "r3", "n3",
        Some(RangeRank.Weight("wgt", "cw3", "tw3"))))
    val fused = RangeRank.rankMulti(data, Seq("g"), specs, buckets = 8)
      .select("g", "id", "r1", "n1", "r2", "n2", "r3", "n3", "cw3", "tw3")
    var solo = data
    specs.foreach { s =>
      solo = RangeRank.rank(solo, Seq("g"), s.keys, s.rankCol, s.nCol,
        s.weight, buckets = 8)
    }
    val soloSel = solo.select("g", "id", "r1", "n1", "r2", "n2", "r3", "n3", "cw3", "tw3")
    assert(fused.exceptAll(soloSel).isEmpty && soloSel.exceptAll(fused).isEmpty,
      "fused multi-rank diverged from sequential single ranks")
  }
}
