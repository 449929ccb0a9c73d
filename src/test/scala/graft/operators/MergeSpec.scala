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
}
