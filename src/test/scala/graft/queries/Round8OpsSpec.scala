package graft.queries

import graft.SparkSpec

/** Plan-shape pins for the round-8 additions — the properties a
  * 100 TB run depends on, asserted on the actual executed plans.
  */
class Round8OpsSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q99: the referential check anti-joins with the dimension side broadcast") {
    val plan = planOf(GovernanceQueries.q99_expectations(spark, sf()))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"FK orphan check should be a broadcast anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q100: profiling never sorts table-sized data (all aggregation in hash space)") {
    val plan = planOf(GovernanceQueries.q100_profile(spark, sf()))
    assert(plan.contains("HashAggregate"))
    // the only SortAggregates allowed are ungrouped (keys=[]) — they
    // aggregate without any Sort operator below them
    val sortAggKeys = "SortAggregate\\(key=\\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1).trim).toSeq
    assert(sortAggKeys.forall(_.isEmpty),
      s"grouped sort aggregation crept back into the profile:\n$sortAggKeys")
  }

  test("q103: the as-of read is ONE multi-path scan, not a union of per-version plans") {
    import graft.io.Versioned
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-r8spec-").toString
    try {
      val t = s"$work/t"
      Versioned.commit(spark, t, Seq((1L, "a")).toDF("id", "v"))
      Versioned.commit(spark, t, Seq((2L, "b")).toDF("id", "v"))
      val plan = planOf(Versioned.readAsOf(spark, t, 2))
      assert("FileScan parquet".r.findAllIn(plan).size === 1,
        s"expected one multi-path FileScan:\n$plan")
      assert(!plan.contains("Union"), s"as-of read should not be a plan union:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
  }

  test("q104: LM scoring plans no cartesian product; corpus scan is pruned to 3 columns") {
    val plan = planOf(LanguageModel.q104_bigram_lm(spark, sf()))
    assert(!plan.contains("CartesianProduct"))
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { s =>
      val cols = s.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols.subsetOf(Set("doc_id", "source", "text")),
        s"scan reads $cols — scoring needs only doc_id/source/text")
    }
  }

  test("q105: the moment table broadcasts back over the scan (no corpus-side shuffle join)") {
    val plan = planOf(DistributionQueries.q105_anomaly(spark, sf()))
    assert(plan.contains("BroadcastHashJoin"),
      s"moments should broadcast — they are |types| rows:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not shuffle for a 5-row join:\n$plan")
  }

  test("q106: decontamination joins by bucket only — no cartesian, no corpus-side probe explode") {
    val df = VectorQueries.q106_semantic_decontam(spark, sf())
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"))
    // the probe fan-out must ride the benchmark side: exactly one
    // Generate explode in the plan, and it sits above a filtered scan
    assert("Generate explode".r.findAllIn(plan).size === 1,
      s"expected exactly one probe explode (benchmark side):\n$plan")
  }

  test("q108: containment candidates come from the bounded posting join, not all pairs") {
    val plan = planOf(TextQueries.q108_containment(spark, sf()))
    assert(!plan.contains("CartesianProduct"))
    // hot-shingle pruning is a broadcast anti-join against the tiny hot set
    assert(plan.contains("LeftAnti"), s"df-cutoff anti-join missing:\n$plan")
  }
}
