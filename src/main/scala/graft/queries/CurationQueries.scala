package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation outputs (SURVEY §2 #60–#61): the
  * operators that APPLY the dedup and quality analyses — what a
  * training-data pipeline actually writes out.
  */
object CurationQueries {

  // ---------- q60: near-dup removal applied ----------

  /** The cleaned corpus after near-dup cluster removal: every document
    * in an LSH cluster except its min-id representative is dropped
    * (pairs alone over- or under-remove; clusters are the correct
    * unit — see q47). The removal itself is one left-anti join of the
    * corpus against the tiny non-representative set, so the full-text
    * side streams exactly once.
    */
  def q60_dedup_apply(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextQueries.lshPairs(spark, dir)
      .select("a_id", "b_id").localCheckpoint()
    val cc = ConnectedComponents.run(pairs, "a_id", "b_id")
    val drop = cc.filter(col("id") =!= col("component")).select(col("id"))
    Tables.load(spark, dir, "documents")
      .join(drop, col("doc_id") === col("id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val q60_oracle: String =
    s"""WITH RECURSIVE pairs AS (${TextQueries.lshPairsSql}),
       |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
       |          UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u AS id, reach.r FROM edges e JOIN reach ON e.v = reach.id),
       |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT d.doc_id, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM lab WHERE id <> cluster_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---------- q61: composite quality filter verdict ----------

  /** C4-style keep/drop verdict with the first failing rule as the
    * reason: length bounds, language detectability, composite quality
    * threshold. One narrow codegen'd pass over the corpus — the
    * decision column is what a curation pipeline partitions its
    * output by.
    */
  def q61_quality_filter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", T.tokens(col("text")))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("lang_det", T.langId(col("toks")))
      .withColumn("quality", T.qualityScore(col("text")))
      .withColumn("verdict",
        when(col("n_toks") < 10, "too_short")
          .when(col("n_toks") > 1000, "too_long")
          .when(col("lang_det") === "und", "unknown_lang")
          .when(col("quality") < 0.4, "low_quality")
          .otherwise("keep"))
      .select(col("doc_id"), col("n_toks"), col("lang_det"),
        col("quality"), col("verdict"))
      .orderBy("doc_id")

  val q61_oracle: String = {
    val toks = T.tokensSql("text")
    s"""SELECT doc_id, n_toks, lang_det, quality,
       |  CASE WHEN n_toks < 10 THEN 'too_short'
       |       WHEN n_toks > 1000 THEN 'too_long'
       |       WHEN lang_det = 'und' THEN 'unknown_lang'
       |       WHEN quality < 0.4 THEN 'low_quality'
       |       ELSE 'keep' END AS verdict
       |FROM (
       |  SELECT doc_id, len($toks) AS n_toks,
       |    ${T.langIdSql(toks)} AS lang_det,
       |    ${T.qualityScoreSql("text")} AS quality
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_dedup_apply" -> (q60_dedup_apply _),
    "q61_quality_filter" -> (q61_quality_filter _))

  val oracles: Map[String, String] = Map(
    "q60_dedup_apply" -> q60_oracle,
    "q61_quality_filter" -> q61_oracle)
}
