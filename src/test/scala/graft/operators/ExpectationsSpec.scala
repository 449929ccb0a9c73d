package graft.operators

import graft.SparkSpec
import graft.operators.Expectations._
import org.apache.spark.sql.DataFrame

/** Fixtures with KNOWN violation counts for every expectation kind —
  * the corpus happens to satisfy most declared constraints, so the
  * operator's counting arithmetic is pinned here on data that
  * violates each one in a controlled way.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def child: DataFrame = Seq(
    (1L, Some("a"), Some(10.0)),
    (1L, Some("a"), Some(-5.0)),   // dup key, below min
    (2L, None, Some(2000.0)),      // null label, above max
    (3L, Some("zz"), None),        // label outside domain, null value
    (9L, Some("b"), Some(50.0))    // key 9 has no parent
  ).toDF("id", "label", "value")

  private def parent: DataFrame =
    Seq(1L, 2L, 3L, 4L).toDF("pid")

  private def resolve(name: String): DataFrame =
    name match { case "child" => child; case "parent" => parent }

  test("each expectation kind counts its violations exactly") {
    val defs = Seq(
      Unique("t_unique", "child", "id"),
      NotNull("t_notnull", "child", "label"),
      AcceptedValues("t_domain", "child", "label", Seq("a", "b")),
      Bounds("t_bounds", "child", "value", min = Some(0.0), max = Some(1000.0)),
      RowCountMin("t_rowcount_ok", "child", 5L),
      RowCountMin("t_rowcount_short", "child", 8L),
      ForeignKey("t_fk", "child", "id", "parent", "pid"))
    val out = Expectations.evaluate(spark, resolve, defs)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getString(5))).toMap
    assert(out("t_unique") === ((1L, "fail")))       // key 1 twice -> 1 surplus row
    assert(out("t_notnull") === ((1L, "fail")))      // one NULL label
    assert(out("t_domain") === ((2L, "fail")))       // "zz" and NULL are outside
    assert(out("t_bounds") === ((2L, "fail")))       // -5 below, 2000 above; NULL not counted
    assert(out("t_rowcount_ok") === ((0L, "pass")))
    assert(out("t_rowcount_short") === ((3L, "fail"))) // 5 rows, needs 8
    assert(out("t_fk") === ((1L, "fail")))           // key 9 orphaned (once)
  }

  test("verdict metadata columns carry the declaration") {
    val out = Expectations.evaluate(spark, resolve,
      Seq(Unique("u1", "child", "id"))).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(1), r.getString(2), r.getString(3)) === (("child", "unique", "id")))
  }

  test("scan-shaped expectations on one table fuse into one aggregation pass") {
    val fused = Expectations.scanViolations(child, Seq(
      Unique("f1", "child", "id"),
      NotNull("f2", "child", "label"),
      Bounds("f3", "child", "value", Some(0.0), None),
      RowCountMin("f4", "child", 3L)))
    // exactly one source scan feeding one aggregate (partial+final of ONE pass)
    val plan = fused.queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size === 1, s"expected one scan, got:\n$plan")
    val row = fused.collect().head
    assert(Seq("f1", "f2", "f3", "f4").map(n => row.getAs[Long](n)) === Seq(1L, 1L, 1L, 0L))
  }

  test("duplicate expectation ids are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.evaluate(spark, resolve, Seq(
        Unique("dup", "child", "id"), NotNull("dup", "child", "label")))
    }
  }

  test("foreign_key ignores NULL child values (NotNull's business)") {
    val withNull = child.unionAll(
      Seq((Option.empty[Long], Option("x"), Option(1.0))).toDF("id", "label", "value")
        .select($"id".cast("long"), $"label", $"value"))
    val out = Expectations.evaluate(
      spark, Map("c" -> withNull, "parent" -> parent),
      Seq(ForeignKey("fk", "c", "id", "parent", "pid"))).collect().head
    assert(out.getLong(4) === 1L) // still just key 9; the NULL row is not an orphan
  }

  test("aggregation strategy sanity: the fused pass is a hash aggregate") {
    val fused = Expectations.scanViolations(child,
      Seq(NotNull("a1", "child", "label"), Bounds("a2", "child", "value", Some(0.0), None)))
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortAggregate"))
  }
}
