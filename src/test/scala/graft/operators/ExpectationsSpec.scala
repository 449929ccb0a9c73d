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

  test("the JSON expectations block round-trips to the typed catalog") {
    val parsed = graft.meta.Metadata.parseExpectations(
      """{"expectations": [
        |  {"id": "u1", "table": "child", "kind": "unique", "column": "id"},
        |  {"id": "n1", "table": "child", "kind": "not_null", "column": "label"},
        |  {"id": "a1", "table": "child", "kind": "accepted_values",
        |   "column": "label", "values": ["a", "b"]},
        |  {"id": "b1", "table": "child", "kind": "bounds", "column": "value",
        |   "min": 0, "max": 1000.5},
        |  {"id": "r1", "table": "child", "kind": "row_count_min", "min_rows": 3},
        |  {"id": "f1", "table": "child", "kind": "foreign_key", "column": "id",
        |   "ref_table": "parent", "ref_column": "pid"}
        |]}""".stripMargin)
    assert(parsed === Seq(
      Unique("u1", "child", "id"),
      NotNull("n1", "child", "label"),
      AcceptedValues("a1", "child", "label", Seq("a", "b")),
      Bounds("b1", "child", "value", Some(0.0), Some(1000.5)),
      RowCountMin("r1", "child", 3L),
      ForeignKey("f1", "child", "id", "parent", "pid")))
    // and the parsed catalog evaluates like the hand-built one
    val verdict = Expectations.evaluate(spark, resolve, parsed)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(verdict === Map("u1" -> 1L, "n1" -> 1L, "a1" -> 2L,
      "b1" -> 2L, "r1" -> 0L, "f1" -> 1L))
  }

  test("q99's shipped catalog is itself parsed from its JSON declaration") {
    val fromJson = graft.meta.Metadata.parseExpectations(
      graft.queries.GovernanceQueries.expectationsJson)
    assert(fromJson.size == 8)
    assert(fromJson.head === Unique("e01_unique_orderkey", "orders", "o_orderkey"))
    assert(fromJson.map(_.id) === fromJson.map(_.id).sorted)
  }

  test("unknown expectation kinds and malformed declarations fail fast at parse time") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[graft.meta.MetadataError] {
        graft.meta.Metadata.parseExpectations(json)
      }
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"expectations": [{"id": "x", "table": "t", "kind": "no_such_kind", "column": "c"}]}""",
      "Unsupported expectation kind 'no_such_kind'")
    bad("""{"expectations": [{"table": "t", "kind": "unique", "column": "c"}]}""",
      "missing 'id'")
    bad("""{"expectations": [{"id": "x", "kind": "unique", "column": "c"}]}""",
      "missing 'table'")
    bad("""{"expectations": [{"id": "x", "table": "t", "kind": "bounds", "column": "c"}]}""",
      "at least one of min/max")
    bad("""{"expectations": [{"id": "x", "table": "t", "kind": "accepted_values",
          "column": "c", "values": []}]}""",
      "empty domain")
    bad("""{"expectations": [
          {"id": "x", "table": "t", "kind": "unique", "column": "c"},
          {"id": "x", "table": "t", "kind": "not_null", "column": "c"}]}""",
      "duplicate expectation id")
    bad("""{"expectations": []}""", "declares no expectations")
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
