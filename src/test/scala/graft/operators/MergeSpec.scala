package graft.operators

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  test("upsert: source wins on match (including source NULLs), both sides' unmatched rows survive") {
    val s = spark
    import s.implicits._
    val target = Seq(
      (1L, Option("t-one"), 10),
      (2L, Option("t-two"), 20)).toDF("k", "name", "v")
    val source = Seq(
      (2L, Option.empty[String], 99), // matched: source row wins, null and all
      (3L, Option("s-three"), 30)).toDF("k", "name", "v")
    val out = Merge.upsert(target, source, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    assert(out == Set(
      (1L, Some("t-one"), 10),
      (2L, None, 99),
      (3L, Some("s-three"), 30)))
  }

  test("upsert rejects mismatched schemas") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "a")).toDF("k", "x")
    val source = Seq((1L, "a")).toDF("k", "y")
    intercept[IllegalArgumentException](Merge.upsert(target, source, Seq("k")))
  }

  test("assertUniqueKeys fails fast on a duplicated source key instead of fanning out") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "t")).toDF("k", "v")
    val dupSource = Seq((1L, "s1"), (1L, "s2")).toDF("k", "v")
    intercept[IllegalArgumentException](
      Merge.upsert(target, dupSource, Seq("k"), assertUniqueKeys = true))
    // unique keys pass the guard with the same result as the default path
    val okSource = Seq((1L, "s1"), (2L, "s2")).toDF("k", "v")
    val out = Merge.upsert(target, okSource, Seq("k"), assertUniqueKeys = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "s1", 2L -> "s2"))
  }
}
