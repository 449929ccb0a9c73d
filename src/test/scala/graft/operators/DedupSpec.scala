package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("keepNewest keeps the greatest (orderBy, tieBreaker) row per key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("k1", "2024-01-01", 1L, "old"),
      ("k1", "2024-01-03", 2L, "new"),
      ("k1", "2024-01-03", 3L, "newer-tie"),
      ("k2", "2024-02-01", 4L, "only")
    ).toDF("k", "d", "id", "tag")
    val out = Dedup.keepNewest(df, col("k"), col("d"), col("id"))
      .select("k", "tag").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "newer-tie", "k2" -> "only"))
  }

  test("NULL orderBy rows lose in both directions (NULLS LAST semantics)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("k", Option("2024-01-02"), 1L),
      ("k", Option.empty[String], 2L)).toDF("k", "d", "id")
    def winner(descending: Boolean): Long =
      Dedup.keepNewest(df, col("k"), col("d"), col("id"), descending)
        .select("id").collect().head.getLong(0)
    assert(winner(descending = true) == 1L)
    assert(winner(descending = false) == 1L) // null would win without the rank guard
  }

  test("NULL tieBreaker rows lose on orderBy ties, in both directions") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("k", "2024-01-02", Option(1L), "real"),
      ("k", "2024-01-02", Option.empty[Long], "null-tie")).toDF("k", "d", "tb", "tag")
    def winner(descending: Boolean): String =
      Dedup.keepNewest(df, col("k"), col("d"), col("tb"), descending)
        .select("tag").collect().head.getString(0)
    assert(winner(descending = true) == "real")
    assert(winner(descending = false) == "real")
  }

  test("keepNewest handles column names containing dots") {
    val s = spark
    import s.implicits._
    val df = Seq(("k1", 1, "x"), ("k1", 2, "y"))
      .toDF("k", "ord", "a.b") // dotted name must stay a literal column
    val out = Dedup.keepNewest(df, col("k"), col("ord"), col("ord"))
      .select(col("`a.b`")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("y"))
  }

  test("keepNewest uses partial aggregation, not a window sort") {
    val df = graft.Tables.load(spark, sf(), "orders")
    val plan = Dedup.keepNewest(df, col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .queryExecution.executedPlan.toString
    // the map-side partial aggregate is what bounds the shuffle to one
    // row per key per task — it must appear below the Exchange
    val exchangeAt = plan.indexOf("Exchange")
    val partialAt = plan.indexOf("partial_max_by")
    assert(partialAt > exchangeAt && exchangeAt >= 0,
      s"expected partial_max_by below the Exchange:\n$plan")
    assert(!plan.contains("Window"), s"window-based dedup would shuffle all rows:\n$plan")
  }

  test("exact dedup keeps min-id representative") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("id", "text")
    val out = Dedup.exact(df, col("text"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("reserved intermediate names are rejected instead of silently misbehaving") {
    val s = spark
    import s.implicits._
    val clash = Seq((1L, 2L)).toDF("__winner", "o")
    intercept[IllegalArgumentException](
      Dedup.keepNewest(clash, col("__winner"), col("o"), col("o")))
    val clash2 = Seq((1L, 2L)).toDF("__dedup_on", "id")
    intercept[IllegalArgumentException](
      Dedup.exact(clash2, col("__dedup_on"), col("id")))
  }
}
