package graft.queries

import graft.Tables
import graft.operators.{ConnectedComponents, Dedup, Merge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cluster resolution, MERGE upsert, and bloom-pruned joins
  * (SURVEY §2 #47–#49).
  */
object GraphQueries {

  private val dec18 = DecimalType(18, 2)

  // ---------- q47: near-dup cluster resolution ----------

  /** Transitive closure of the MinHash-LSH candidate pairs (q25):
    * pair lists alone over-remove (a~b and b~c may both be kept if
    * pairs are processed independently) — clusters with one min-id
    * representative are the correct unit of corpus dedup. Components
    * come from iterative min-label propagation
    * ([[ConnectedComponents]]); dup graphs are near-cliques, so 2–4
    * label rounds on the PAIR VERTICES only (never the full corpus)
    * finish the job at any scale.
    */
  def q47_dup_clusters(spark: SparkSession, dir: String): DataFrame = {
    // materialize the pair table once: label propagation issues one
    // action per round, and without this each round would re-run the
    // whole LSH pipeline (measured 6x the query cost at sf0.1)
    val pairs = TextQueries.lshPairs(spark, dir)
      .select("a_id", "b_id").transform(graft.Lineage.cut)
    val cc = ConnectedComponents.run(pairs, "a_id", "b_id")
    val sizes = cc.groupBy(col("component").as("comp"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, col("component") === col("comp"))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  val q47_oracle: String =
    s"""WITH RECURSIVE pairs AS (${TextQueries.lshPairsSql}),
       |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
       |          UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u AS id, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
       |SELECT lab.id AS doc_id, lab.cluster_id, cs.cluster_size
       |FROM lab JOIN cs USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  // ---------- q48: MERGE-style upsert ----------

  /** Lakehouse MERGE INTO re-expressed as one full-outer join
    * ([[Merge.upsert]]): the pre-1998 per-customer snapshot upserted
    * with the newest 1998+ order per customer. Source rows win on
    * match; unmatched snapshot rows survive — the general form of the
    * reference's incremental consolidation.
    */
  def q48_merge_upsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
    def newestPerCust(df: DataFrame): DataFrame =
      Dedup.keepNewest(df, col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val target = newestPerCust(orders.filter(col("o_orderdate") < cutoff))
    val source = newestPerCust(orders.filter(col("o_orderdate") >= cutoff))
    Merge.upsert(target, source, Seq("o_custkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("snapshot_date"),
        col("o_totalprice"))
      .orderBy("o_custkey")
  }

  val q48_oracle: String =
    """WITH t AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |  WHERE rn = 1),
      |s AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |  WHERE rn = 1)
      |SELECT coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
      |  CASE WHEN s.o_custkey IS NOT NULL THEN s.o_orderkey ELSE t.o_orderkey END AS o_orderkey,
      |  strftime(CASE WHEN s.o_custkey IS NOT NULL THEN s.o_orderdate ELSE t.o_orderdate END,
      |    '%Y-%m-%d') AS snapshot_date,
      |  CASE WHEN s.o_custkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
      |FROM t FULL OUTER JOIN s ON t.o_custkey = s.o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---------- q49: bloom-filter join pruning ----------

  /** Fact-side pre-join pruning with a broadcast Bloom filter built on
    * the selected dimension keys. Semantically transparent — the join
    * discards false positives, so the result equals the plain join
    * (which IS the oracle). At 100 TB the payoff is shuffle volume:
    * with a shuffle join, pruning at the scan cuts the fact shuffle by
    * the dim predicate's selectivity (~1/25 here) before any exchange;
    * Spark's AQE runtime bloom (spark.sql.optimizer.runtime
    * .bloomFilter.enabled) injects the same filter automatically when
    * thresholds allow — this is the explicit form for when it can't.
    * The membership test is Spark's own codegen'd
    * BloomFilterMightContain (injected as `bloom_might_contain` by
    * GraftExtensions), so the fact scan stays one whole-stage-codegen
    * span — no per-row UDF call on the hot path.
    */
  def q49_bloom_prune(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.load(spark, dir, "nation").filter(col("n_name") === "NATION_7")
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long").as("s_suppkey"))
    // stat.bloomFilter NPEs on an empty input; an empty dim side means
    // "prune everything", which an item-less filter encodes correctly
    val bloom =
      if (supp.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(1, 0.01)
      else supp.stat.bloomFilter("s_suppkey", 10000L, 0.01)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"))
      .filter(call_function("bloom_might_contain",
        lit(bloomBytes), col("l_suppkey").cast("long")))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(dec18)).cast("double").as("revenue"))
      .orderBy("s_suppkey")
  }

  val q49_oracle: String =
    """SELECT s_suppkey, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_dup_clusters" -> (q47_dup_clusters _),
    "q48_merge_upsert" -> (q48_merge_upsert _),
    "q49_bloom_prune" -> (q49_bloom_prune _))

  val oracles: Map[String, String] = Map(
    "q47_dup_clusters" -> q47_oracle,
    "q48_merge_upsert" -> q48_oracle,
    "q49_bloom_prune" -> q49_oracle)
}
