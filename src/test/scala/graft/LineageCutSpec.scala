package graft

import org.apache.spark.storage.StorageLevel

/** Pins the `spark.graft.lineageCut` contract: `local` (default)
  * checkpoints (plan becomes a scan — the pre-round-11 behavior,
  * unchanged), `disk` persists with lineage intact for cluster
  * recovery, anything else is rejected loudly.
  */
class LineageCutSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  test("default mode localCheckpoints (plan is cut)") {
    spark.conf.unset("spark.graft.lineageCut")
    val out = Lineage.cut(sample)
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("disk mode persists DISK_ONLY eagerly and keeps the plan") {
    spark.conf.set("spark.graft.lineageCut", "disk")
    try {
      val df = sample
      val out = Lineage.cut(df)
      assert(out.storageLevel === StorageLevel.DISK_ONLY)
      assert(!out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
      assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      out.unpersist()
    } finally spark.conf.unset("spark.graft.lineageCut")
  }

  test("an unknown mode fails at the cut site, not silently") {
    spark.conf.set("spark.graft.lineageCut", "ram")
    try {
      intercept[IllegalArgumentException](Lineage.cut(sample))
    } finally spark.conf.unset("spark.graft.lineageCut")
  }

  test("keepLineage overrides both modes (the Explain audit hook)") {
    System.setProperty("graft.keepLineage", "true")
    try {
      val df = sample
      assert(Lineage.cut(df) eq df)
    } finally System.clearProperty("graft.keepLineage")
  }
}
