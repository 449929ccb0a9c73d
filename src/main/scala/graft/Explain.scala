package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted executed plan of one
  * or all SparkEntry queries. Used for the explain-audit loop
  * (SURVEY §5): verify pushdown (PushedFilters/ReadSchema), join
  * strategies (BroadcastHashJoin vs SortMergeJoin), and codegen spans.
  *
  * Usage: graft.Explain <sfDir> [queryName] [--run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // --out <dir>: also write each query's explain("formatted") text
    // to <dir>/<name>.txt — the committed plan evidence the
    // optimization rounds keep under plans/rNN/
    val out: Option[String] = args.sliding(2).collectFirst {
      case Array("--out", d) => d
    }
    val outIdx = args.indexOf("--out")
    val positional = args.zipWithIndex.drop(1).collect {
      case (a, i) if !a.startsWith("--") && i != outIdx + 1 => a
    }
    // comma-separated query names (one name still works)
    val which: Option[Set[String]] =
      positional.headOption.map(_.split(",").toSet)
    val run = args.contains("--run")
    // disable the perf-only localCheckpoint lineage cuts so the audit
    // sees the full plan beneath them (correctness-critical checkpoints
    // in the streaming/temp-dir queries stay on; see [[Lineage]])
    System.setProperty("graft.keepLineage", "true")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // same extensions as Bench — without them the audit would print
      // the declarative plans, not the rule-rewritten ones benchmarked
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = SparkEntry.queries
      .filter { case (n, _) => which.forall(_.contains(n)) }.toSeq.sortBy(_._1)
    targets.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      if (run) df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(plan).size
      println(s"== $name ==")
      println(s"  exchanges=${n("Exchange")} broadcastJoins=${n("BroadcastHashJoin")} " +
        s"smj=${n("SortMergeJoin")} bnlj=${n("BroadcastNestedLoopJoin")} " +
        s"cartesian=${n("CartesianProduct")} window=${n("Window ")} " +
        s"codegenSpans=${n("\\*\\(\\d+\\)")}")
      out.foreach { d =>
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"$name.txt"), formatted)
      }
      if (which.isDefined) println(plan)
    }
    spark.stop()
  }
}
