package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounds q205 (rows-only by design — KLL compaction is randomized):
  * tile populations must respect KLL's normalized-rank guarantee and
  * the tiles must partition each group in value order.
  */
class SketchNtileSpec extends SparkSpec {

  test("q205: tiles partition each type; populations within the KLL rank-error bound") {
    val rows = GovernanceQueries.q205_sketch_ntile(spark, sf("sf0.01")).collect()
    val totals = graft.Tables.load(spark, sf("sf0.01"), "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (et, tiles) =>
      val n = totals(et)
      assert(tiles.map(_.getLong(2)).sum === n, s"$et: tiles must cover every row")
      assert(tiles.map(_.getInt(1)).toSet.subsetOf((1 to 5).toSet))
      // KLL k=200 ⇒ ~1.65% two-sided rank error per boundary; a tile
      // touches two boundaries — allow 2ε·n + 1 slack each side
      val eps = math.ceil(2 * 0.0165 * n).toLong + 1
      tiles.foreach { t =>
        val pop = t.getLong(2)
        assert(math.abs(pop - n / 5) <= n / 5 / 2 + eps,
          s"$et tile ${t.getInt(1)}: population $pop vs ideal ${n / 5} ± $eps")
      }
      // value ranges must be ordered with the tiles
      val sorted = tiles.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3),
          "tile value ranges must not overlap (threshold ties share a tile)")
        case _ => ()
      }
    }
  }
}
