package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q115's branch coverage beyond the oracle: the oracle proves
  * O(delta) == two-snapshot diff on the corpus, but every corpus
  * delta row is NEWER than prior state — the losing-delta branch
  * (emit nothing) never fires there. Fixtures drive all four
  * branches: insert, winning update, losing delta (silent), and the
  * same-timestamp orderkey tiebreak.
  */
class DeltaChangelogSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("insert / winning update / losing delta / tiebreak") {
    import spark.implicits._
    val state1 = Seq(
      // k1: state newer than the delta row -> delta must emit NOTHING
      (1L, 10L, ts("2020-05-01 00:00:00"), 100.0),
      // k2: delta newer -> update
      (2L, 20L, ts("2020-01-01 00:00:00"), 200.0),
      // k4: same timestamp, delta has the higher orderkey -> wins
      (4L, 40L, ts("2020-01-01 00:00:00"), 400.0),
      // k5: same timestamp, delta has the LOWER orderkey -> loses
      (5L, 50L, ts("2020-01-01 00:00:00"), 500.0))
      .toDF("o_custkey", "old_orderkey", "old_ts", "old_price")
    val deltaWin = Seq(
      (1L, 9L, ts("2019-01-01 00:00:00"), 90.0),
      (2L, 21L, ts("2021-01-01 00:00:00"), 210.0),
      (3L, 30L, ts("2020-06-01 00:00:00"), 300.0), // k3: new key -> insert
      (4L, 41L, ts("2020-01-01 00:00:00"), 410.0),
      (5L, 49L, ts("2020-01-01 00:00:00"), 490.0))
      .toDF("o_custkey", "new_orderkey", "new_ts", "new_price")
    val out = ChangeCapture.deltaChangelog(state1, deltaWin)
      .orderBy("o_custkey")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("update", 2L), ("insert", 3L), ("update", 4L)))
  }

  test("tombstone branches: winning delete / absent-key silent / losing silent") {
    import spark.implicits._
    val state1 = Seq(
      (1L, 10L, ts("2020-01-01 00:00:00"), 100.0),  // k1: will be deleted
      (2L, 20L, ts("2020-05-01 00:00:00"), 200.0))  // k2: losing tombstone
      .toDF("o_custkey", "old_orderkey", "old_ts", "old_price")
    val deltaWin = Seq(
      // k1: tombstone newer than state -> delete, new side nulled
      (1L, null.asInstanceOf[java.lang.Long], ts("2021-01-01 00:00:00"),
        null.asInstanceOf[java.lang.Double], true),
      // k3: tombstone for a key that never existed -> nothing
      (3L, null.asInstanceOf[java.lang.Long], ts("2021-01-01 00:00:00"),
        null.asInstanceOf[java.lang.Double], true),
      // k2: tombstone OLDER than state -> loses keep-newest, nothing
      (2L, null.asInstanceOf[java.lang.Long], ts("2019-01-01 00:00:00"),
        null.asInstanceOf[java.lang.Double], true))
      .toDF("o_custkey", "new_orderkey", "new_ts", "new_price",
        graft.io.Versioned.tombstoneCol)
    val out = ChangeCapture.deltaChangelog(state1, deltaWin).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "delete" && r.getLong(1) === 1L)
    assert(r.getLong(2) === 10L && r.getString(4) === "2020-01-01"
      && r.getDouble(6) === 100.0, "old state attached to the delete")
    assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(7),
      "new side must be NULL on a delete")
  }

  test("a winning delta row with identical tracked columns emits no update") {
    import spark.implicits._
    // newer timestamp but same orderkey/date/price: keep-newest picks
    // it, yet nothing the changelog tracks changed -> silent (exactly
    // what the two-snapshot diff would decide). Same DAY, later time:
    // the formatted date is unchanged while the raw timestamp wins.
    val state1 = Seq((1L, 10L, ts("2020-05-01 08:00:00"), 100.0))
      .toDF("o_custkey", "old_orderkey", "old_ts", "old_price")
    val deltaWin = Seq((1L, 10L, ts("2020-05-01 09:00:00"), 100.0))
      .toDF("o_custkey", "new_orderkey", "new_ts", "new_price")
    assert(ChangeCapture.deltaChangelog(state1, deltaWin).count() == 0)
  }
}
