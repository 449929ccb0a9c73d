package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Round-14 gate-strength pins:
  *
  *   - q238's lapse anti-join runs on a LIVE branch against the real
  *     corpus: the cutoff sits inside the order-date range, so the
  *     date-filtered orders side is non-empty and the anti-join
  *     excludes at least one above-average-balance customer. A
  *     degenerate (empty right side) anti-join would make the oracle
  *     row unable to distinguish a broken anti-join from a working
  *     one.
  *   - q241's three lineitem FK audits share ONE fact scan: the key
  *     columns are projected once and materialized via Lineage.cut,
  *     so the assembled physical plan holds ZERO lineitem file scans
  *     (the single scan already ran at build), while with lineage
  *     cuts disabled the logical plan shows the shared projection.
  */
class Round14OpsSpec extends SparkSpec {

  test("q238: anti-join branch is live on the corpus — lapsed rich < all rich") {
    val dir = sf()
    val got = RelationalQueries.q238_rich_no_orders(spark, dir)
      .agg(sum("n_cust")).collect().head.getLong(0)
    // the same rich predicate with the lapse filter removed
    val cust = graft.Tables.load(spark, dir, "customer")
      .select(col("c_acctbal"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("bal_c"))
    val stats = cust.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("sum_pos_c"), count(lit(1)).as("n_pos"))
    val rich = cust.crossJoin(broadcast(stats))
      .filter(col("bal_c") * col("n_pos") > col("sum_pos_c"))
      .count()
    assert(got > 0L, "q238 returned no lapsed rich customers at all")
    assert(got < rich,
      s"anti-join filtered nothing: lapsed rich $got == all rich $rich " +
        "(right side degenerate — cutoff outside the order-date range?)")
  }

  test("q241: the three lineitem FK audits share one fact scan") {
    val dir = sf()
    val plan = ConsistencyQueries.q241_referential_integrity(spark, dir)
      .queryExecution.executedPlan
    val liScans = plan.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => s
    }
    assert(liScans.isEmpty,
      s"expected the lineitem keys to come off the materialized shared " +
        s"projection (zero lineitem scans in the assembled plan), found " +
        s"${liScans.size}")
  }
}
