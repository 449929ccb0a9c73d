package graft.queries

import graft.SparkSpec

/** Pins q159's asymmetric pruning: on the old layout (day only), day
  * prunes directories while source survives as a pushed DATA filter;
  * on the new layout (day, source), BOTH predicates are partition
  * filters and the scan carries no source data-filter at all.
  */
class PartitionEvolutionSpec extends SparkSpec {

  /** Bracket contents of `label: [...]` inside a one-line FileScan. */
  private def section(plan: String, label: String): String = {
    val i = plan.indexOf(s"$label: [")
    if (i < 0) "" else plan.substring(i + label.length + 3,
      plan.indexOf("]", i + label.length + 3))
  }

  test("q159: day prunes both generations; source prunes only the new spec") {
    val (gen1, gen2) = ChangeCapture.partitionEvolutionPlans(spark, sf())
    // both layouts: day is a partition filter
    assert(section(gen1, "PartitionFilters").contains("day"))
    assert(section(gen2, "PartitionFilters").contains("day"))
    // old layout: source is a pushed DATA filter on the scan
    assert(section(gen1, "PushedFilters").contains("source") ||
      section(gen1, "DataFilters").contains("source"),
      s"gen1 lacks a source data filter:\n$gen1")
    assert(!section(gen1, "PartitionFilters").contains("source"))
    // new layout: source IS a partition filter and no data filter remains
    assert(section(gen2, "PartitionFilters").contains("source"),
      s"gen2 PartitionFilters lack source:\n$gen2")
    assert(!section(gen2, "PushedFilters").contains("source") &&
      !section(gen2, "DataFilters").contains("source"),
      s"gen2 still data-filters source:\n$gen2")
  }

  test("q159: result equals the unsplit-table recompute (layout transparency)") {
    val got = ChangeCapture.q159_partition_evolution(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(d => d._1 % 7 == 3 && (d._2 == "src1" || d._2 == "src2"))
    val expect = docs.groupBy(_._2).map { case (s, rows) =>
      (s, rows.length.toLong, rows.map(_._3).sum, rows.map(_._1).sum) }.toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
