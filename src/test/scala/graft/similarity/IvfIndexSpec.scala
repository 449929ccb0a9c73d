package graft.similarity

import graft.SparkSpec
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  test("every vector lands in exactly one of k cells; probes are distinct") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val model = IvfIndex.train(e, "v", k = 8)
    assert(model.centroids.length == 8)
    val cells = e.withColumn("cell", model.cell(col("v")))
    assert(cells.count() == e.count())
    val distinctCells = cells.select("cell").distinct().count()
    assert(distinctCells > 1 && distinctCells <= 8)
    val probes = e.limit(5)
      .select(model.probeCells(col("v"), 3).as("p"))
      .collect().map(_.getSeq[Int](0))
    assert(probes.forall(p => p.length == 3 && p.distinct.length == 3))
  }

  test("two-level quantizer: deterministic, √k-shaped, total and bounded cell ids") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val k = 9
    val m1 = IvfIndex.trainTwoLevel(e, "v", k, sampleIdCol = Some("vec_id"))
    val m2 = IvfIndex.trainTwoLevel(e, "v", k, sampleIdCol = Some("vec_id"))
    // train-twice equality: no RNG anywhere
    assert(m1 == m2)
    // √k shape: 3 top cells, each with <= 3 fine centroids, >= k total
    assert(m1.top.length == 3)
    assert(m1.fine.forall(f => f.nonEmpty && f.length <= 3))
    assert(m1.numCells >= k || m1.numCells == m1.fine.map(_.length).sum)
    // assignment is total and in-range: every vector lands in exactly
    // one global cell id within [0, numCells)
    val assigned = e
      .withColumn("topcell", m1.topCell(col("v")))
      .withColumn("cell", m1.cell(col("topcell"), col("v")))
    assert(assigned.count() == e.count())
    val range = assigned.agg(min("cell"), max("cell")).collect().head
    assert(range.getInt(0) >= 0 && range.getInt(1) < m1.numCells)
    // fine refinement is real: more distinct global cells than top cells
    val nTop = assigned.select("topcell").distinct().count()
    val nCell = assigned.select("cell").distinct().count()
    assert(nCell >= nTop)
  }

  test("data-literal cell forms are bit-equal to the expanded/CASE-chain forms") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    // flat model: literal form vs O(k·dim)-node expanded form
    val flat = IvfIndex.train(e, "v", k = 16, sampleIdCol = Some("vec_id"))
    val flatDiff = e
      .select(flat.cell(col("v")).as("a"), flat.cellExpanded(col("v")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(flatDiff == 0, s"flat cell() diverged on $flatDiff rows")
    // two-level model: literal form vs CASE-chain form, on the
    // precomputed-topcell contract both use
    val two = IvfIndex.trainTwoLevel(e, "v", k = 9, sampleIdCol = Some("vec_id"))
    val assigned = e.withColumn("topcell", two.topCell(col("v")))
    val twoDiff = assigned
      .select(two.cell(col("topcell"), col("v")).as("a"),
        two.cellCaseChain(col("topcell"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twoDiff == 0, s"two-level cell() diverged on $twoDiff rows")
    // probe lists: literal form vs expanded form, element for element
    val probeDiff = e
      .select(flat.probeCells(col("v"), 4).as("a"),
        flat.probeCellsExpanded(col("v"), 4).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(probeDiff == 0, s"probeCells() diverged on $probeDiff rows")
  }

  test("cell-assignment plan size is independent of k") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    def nodes(frame: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.Column): Int =
      frame.select(c.as("x")).queryExecution.analyzed.expressions
        .map(_.collect { case x => x }.size).sum
    // flat quantizer: same expression-tree size at k=4 and k=25
    val f1 = IvfIndex.train(e, "v", k = 4, sampleIdCol = Some("vec_id"))
    val f2 = IvfIndex.train(e, "v", k = 25, sampleIdCol = Some("vec_id"))
    assert(nodes(e, f1.cell(col("v"))) == nodes(e, f2.cell(col("v"))))
    // two-level quantizer likewise (k=4 → 2 top cells, k=25 → 5)
    val t1 = IvfIndex.trainTwoLevel(e, "v", 4, sampleIdCol = Some("vec_id"))
    val t2 = IvfIndex.trainTwoLevel(e, "v", 25, sampleIdCol = Some("vec_id"))
    val a1 = e.withColumn("topcell", t1.topCell(col("v")))
    val a2 = e.withColumn("topcell", t2.topCell(col("v")))
    val n1 = nodes(a1, t1.cell(col("topcell"), col("v")))
    val n2 = nodes(a2, t2.cell(col("topcell"), col("v")))
    assert(n1 == n2, s"two-level plan grew with k: $n1 vs $n2")
    assert(n2 < 120, s"two-level assignment plan unexpectedly large: $n2 nodes")
    // and the top-level assignment and probe lists stay constant-size too
    assert(nodes(e, t1.topCell(col("v"))) == nodes(e, t2.topCell(col("v"))))
    assert(nodes(e, f1.probeCells(col("v"), 3)) == nodes(e, f2.probeCells(col("v"), 3)))
  }

  test("two-level assignment plans and runs at a large synthetic k") {
    // k = 10,000 cells (100 top × 100 fine), built directly — training
    // is irrelevant to PLAN size. The retired CASE-chain spelling was
    // O(k·dim) ≈ 80k literal NODES at this k and could not plan at the
    // real design point (k = N/500 ≈ 2M cells at 100 TB); the
    // data-literal form carries the same doubles in three Literal
    // nodes and must both analyze and execute.
    val dim = 8
    def c(seed: Int): Seq[Double] =
      (0 until dim).map(i => ((seed * 31 + i * 7) % 97).toDouble)
    val top = (0 until 100).map(t => c(t))
    val fine = (0 until 100).map(t => (0 until 100).map(f => c(100 + t * 100 + f)))
    val m = IvfIndex.TwoLevelModel(top, fine)
    assert(m.numCells == 10000)
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(slice(
        graft.functions.VectorFunctions.asDouble(col("embedding")), 1, dim).as("v"))
    val assigned = e
      .withColumn("topcell", m.topCell(col("v")))
      .withColumn("cell", m.cell(col("topcell"), col("v")))
    val r = assigned.agg(min("cell"), max("cell"), count(lit(1))).collect().head
    assert(r.getInt(0) >= 0 && r.getInt(1) < m.numCells && r.getLong(2) > 0)
  }

  test("assignCells: broadcast-codebook form is value-equal to the literal form; both paths exercised") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val m = IvfIndex.trainTwoLevel(e, "v", k = 9, sampleIdCol = Some("vec_id"))
    val assigned = e.withColumn("topcell", m.topCell(col("v")))
    // the real corpus sits below the cap → the default picks the
    // literal path (no join anywhere in the plan)
    assert(m.fineDoubles <= m.literalDoubleCap)
    val viaLit = m.assignCells(assigned, "topcell", "v", "cell")
    assert(!viaLit.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "literal path unexpectedly planned a join")
    // forcing the cap to 0 takes the broadcast-table path
    val viaBc = m.assignCells(assigned, "topcell", "v", "cell", maxLiteralDoubles = 0L)
    assert(viaBc.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "broadcast path did not plan a broadcast-hash join")
    val a = viaLit.select("vec_id", "cell")
    val b = viaBc.select("vec_id", "cell")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "broadcast-codebook assignment diverged from the literal form")
    // at a synthetic k past the cap the DEFAULT picks broadcast and
    // still executes: 100 top × 200 fine × dim 8 = 160k doubles > cap
    val dim = 8
    def c(seed: Int): Seq[Double] =
      (0 until dim).map(i => ((seed * 31 + i * 7) % 97).toDouble)
    val big = IvfIndex.TwoLevelModel(
      (0 until 100).map(c),
      (0 until 100).map(t => (0 until 200).map(f => c(100 + t * 200 + f))))
    assert(big.fineDoubles > big.literalDoubleCap)
    val eSmall = e.select(col("vec_id"), slice(col("v"), 1, dim).as("v"))
      .withColumn("topcell", big.topCell(col("v")))
    val bigAssigned = big.assignCells(eSmall, "topcell", "v", "cell")
    assert(bigAssigned.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "past-cap model did not take the broadcast path by default")
    val r = bigAssigned.agg(min("cell"), max("cell"), count(lit(1))).collect().head
    assert(r.getInt(0) >= 0 && r.getInt(1) < big.numCells && r.getLong(2) === e.count())
  }

  test("IVF 4-probe recall@3 beats random-scan expectations vs brute force") {
    val ivf = VectorQueries.q42_knn_ivf(spark, sf())
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = VectorQueries.q28_knn_bruteforce(spark, sf())
      .filter(col("rk") <= 3)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      ivf.get(q).map(found => (found intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    // 4 of 16 cells scanned = 25% of the corpus; random 25% would give
    // recall ~0.25 — the trained quantizer must do meaningfully better
    assert(meanRecall > 0.4, s"mean recall@3 = $meanRecall")
  }
}
