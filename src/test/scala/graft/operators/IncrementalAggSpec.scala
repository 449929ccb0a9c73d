package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The merge property that makes incremental maintenance sound:
  * merge(state(a), state(b), ...) === state(a ∪ b ∪ ...) for ANY
  * partition of the input, including empty and skewed splits.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  private def mkDf(rows: Seq[(String, Double)]): DataFrame =
    rows.toDF("k", "v")

  private def rendered(state: DataFrame): Map[String, (Long, Double, Double, Double, Double)] =
    IncrementalAgg.finish(state, keys).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("merge of any partition equals the full rescan (random splits, seeded)") {
    val rng = new scala.util.Random(42)
    val all = Seq.fill(300)((s"k${rng.nextInt(7)}", (rng.nextInt(100000) / 100.0) - 200.0))
    val full = rendered(IncrementalAgg.state(mkDf(all), keys, "v"))
    for (nSplits <- Seq(2, 3, 5)) {
      val parts = all.groupBy(_ => rng.nextInt(nSplits)).values.toSeq
      val states = parts.map(p => IncrementalAgg.state(mkDf(p), keys, "v"))
      assert(rendered(IncrementalAgg.merge(states, keys)) === full,
        s"merge of $nSplits splits diverged from rescan")
    }
  }

  test("an empty batch is a no-op merge") {
    val a = Seq(("x", 1.5), ("y", -2.25))
    val sa = IncrementalAgg.state(mkDf(a), keys, "v")
    val se = IncrementalAgg.state(mkDf(Seq.empty), keys, "v")
    assert(rendered(IncrementalAgg.merge(Seq(sa, se), keys)) === rendered(sa))
  }

  test("a batch containing an unseen group creates that group") {
    val sa = IncrementalAgg.state(mkDf(Seq(("x", 1.0))), keys, "v")
    val sb = IncrementalAgg.state(mkDf(Seq(("new", 3.0), ("new", 5.0))), keys, "v")
    val out = rendered(IncrementalAgg.merge(Seq(sa, sb), keys))
    assert(out.keySet === Set("x", "new"))
    assert(out("new") === ((2L, 8.0, 3.0, 5.0, 4.0)))
  }

  test("merge is order-insensitive") {
    val parts = Seq(
      Seq(("a", 1.0), ("b", 2.0)), Seq(("a", 3.0)), Seq(("b", -1.0), ("a", 0.5)))
    val states = parts.map(p => IncrementalAgg.state(mkDf(p), keys, "v"))
    val fwd = rendered(IncrementalAgg.merge(states, keys))
    val rev = rendered(IncrementalAgg.merge(states.reverse, keys))
    assert(fwd === rev)
  }
}
