package graft.queries

import graft.Tables
import graft.functions.{HashFunctions => H, TextFunctions => T}
import graft.meta._
import graft.operators.ConnectedComponents
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interpreter for the metadata-declared curation chain
  * ([[graft.meta.CurationDef]]): the reference's config-as-data
  * pattern (reference config/metadata_motor.json driving
  * pipeline/runner.py) applied to the LLM curation operators, so a
  * funnel like q86's — exact dedup → near-dedup → quality filter →
  * decontamination — is one JSON string instead of hand-composed
  * code. Every stage keeps the operator's own plan shape:
  *
  *  - `dedup_exact`: q23's content-hash representative aggregate;
  *  - `dedup_near`: q60's LSH-pair connected components (documents'
  *    signature family);
  *  - `quality_filter`: q61's narrow per-row predicate, with the rule
  *    table coming from the config;
  *  - `decontaminate`: q67's broadcast shingle posting join, with the
  *    benchmark list coming from the config.
  *
  * Scale shape is q86's, independent of what the config declares:
  * stage memberships are bounded keep/drop sets LEFT-JOINED onto ONE
  * pass over the corpus (memberships compose as conjunctions in the
  * declared order), and the report is a partial agg on the declared
  * report axis. A config change re-plans the same bounded skeleton —
  * it can never introduce an unbounded join, because the stage
  * vocabulary only contains operators with a fixed shuffle shape.
  *
  * [[oracleSql]] renders the SAME parsed config as the DuckDB twin,
  * so the driver's correctness gate checks the config → plan
  * interpretation end-to-end: if the interpreter ever drifts from the
  * declared semantics, the generated oracle still speaks the config
  * and the hashes split.
  */
object CurationFlow {

  // ---------- Spark interpretation ----------

  private def ruleCol(r: QualityRuleDef): Column = {
    val m = col(r.metric)
    r.op match {
      case "lt" => m < numLit(r)
      case "gt" => m > numLit(r)
      case _    => m === lit(r.strValue.get)
    }
  }

  private def numLit(r: QualityRuleDef): Column = {
    val v = r.numValue.get
    if (v.isWhole) lit(v.toLong) else lit(v.toDouble)
  }

  def run(spark: SparkSession, dir: String, cur: CurationDef): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, cur.table)
    val needQuality = cur.stages.exists(_.isInstanceOf[QualityStageDef])
    var base = docs
      .withColumn("toks", T.tokens(col(cur.textColumn)))
      .withColumn("n_toks", size(col("toks")).cast("long"))
    if (needQuality) base = base
      .withColumn("lang_det", T.langId(col("toks")))
      .withColumn("quality", T.qualityScore(col(cur.textColumn)))
    // one membership column/predicate per declared stage, each the
    // operator's own bounded-set shape
    val members: Seq[Column] = cur.stages.map {
      case DedupExactStageDef(name) =>
        val keep = docs
          .groupBy(md5(col(cur.textColumn)).as("h"))
          .agg(min(col(cur.idColumn)).as(cur.idColumn))
          .select(col(cur.idColumn), lit(1L).as(s"m_$name"))
        base = base.join(keep, Seq(cur.idColumn), "left")
        col(s"m_$name").isNotNull
      case DedupNearStageDef(name) =>
        val pairs = TextQueries.lshPairs(spark, dir)
          .select("a_id", "b_id").transform(graft.Lineage.cut)
        val dropSet = ConnectedComponents.run(pairs, "a_id", "b_id")
          .filter(col("id") =!= col("component"))
          .select(col("id").as(cur.idColumn), lit(1L).as(s"m_$name"))
        base = base.join(dropSet, Seq(cur.idColumn), "left")
        col(s"m_$name").isNull
      case QualityStageDef(_, rules) =>
        !rules.map(ruleCol).reduce(_ || _)
      case DecontaminateStageDef(name, shingles) =>
        val bench = shingles.toDF("s")
        val contaminated = docs
          .select(col(cur.idColumn),
            explode(call_function("shingles3", col(cur.textColumn))).as("s"))
          .join(broadcast(bench), "s")
          .select(cur.idColumn).distinct()
          .withColumn(s"m_$name", lit(1L))
        base = base.join(contaminated, Seq(cur.idColumn), "left")
        col(s"m_$name").isNull
    }
    // conjunctions in declared order: stage i survives iff stages 1..i do
    val sCols = members.scanLeft(lit(true))(_ && _).tail
    val staged = base.select(
      col(cur.reportBy) +: col("n_toks") +:
        sCols.zipWithIndex.map { case (c, i) => c.as(s"s${i + 1}") }: _*)
    val stageCounts = cur.stages.zipWithIndex.map { case (st, i) =>
      count(when(col(s"s${i + 1}"), 1)).as(s"n_${st.name}")
    }
    staged
      .groupBy(cur.reportBy)
      .agg(
        count(lit(1)).as("n_raw"),
        stageCounts :+
          sum(when(col(s"s${cur.stages.size}"), col("n_toks")).otherwise(0L))
            .as("tokens_final"): _*)
      .orderBy(cur.reportBy)
  }

  // ---------- generated DuckDB twin ----------

  private def sq(s: String): String = s.replace("'", "''")

  private def ruleSql(r: QualityRuleDef): String = r.op match {
    case "lt" => s"${r.metric} < ${renderNum(r)}"
    case "gt" => s"${r.metric} > ${renderNum(r)}"
    case _    => s"${r.metric} = '${sq(r.strValue.get)}'"
  }

  private def renderNum(r: QualityRuleDef): String = {
    val v = r.numValue.get
    if (v.isWhole) v.toLong.toString else v.bigDecimal.toPlainString
  }

  def oracleSql(cur: CurationDef): String = {
    val tk = T.tokensSql(cur.textColumn)
    val hasNear = cur.stages.exists(_.isInstanceOf[DedupNearStageDef])
    val quality = cur.stages.collectFirst { case q: QualityStageDef => q }
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    if (hasNear) {
      ctes += s"pairs AS (${TextQueries.lshPairsSql})"
      ctes += "edges AS (SELECT a_id AS u, b_id AS v FROM pairs" +
        "\n          UNION SELECT b_id, a_id FROM pairs)"
      ctes += "reach AS (\n  SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges)" +
        "\n  UNION\n  SELECT e.u AS id, reach.r FROM edges e JOIN reach ON e.v = reach.id)"
      ctes += "lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)"
      ctes += "neardrop AS (SELECT id AS did FROM lab WHERE id <> cluster_id)"
    }
    if (cur.stages.exists(_.isInstanceOf[DedupExactStageDef]))
      ctes += s"exact AS (SELECT min(${cur.idColumn}) AS did FROM ${cur.table} " +
        s"GROUP BY md5(${cur.textColumn}))"
    cur.stages.collectFirst { case d: DecontaminateStageDef => d }.foreach { d =>
      val sh = H.shinglesSql(tk)
      val list = d.shingles.map(s => s"'${sq(s)}'").mkString("[", ", ", "]")
      ctes += s"contam AS (\n  SELECT did FROM (SELECT ${cur.idColumn} AS did, $sh AS sh " +
        s"FROM ${cur.table})\n  WHERE len(list_intersect(list_distinct(sh), $list)) > 0)"
    }
    val qualityCols = quality.map(_ =>
      s",\n      ${T.langIdSql(tk)} AS lang_det," +
        s"\n      ${T.qualityScoreSql(cur.textColumn)} AS quality").getOrElse("")
    val keepCol = quality.map(q =>
      ",\n    " + q.rules.map(ruleSql).mkString("NOT (", " OR ", ")") + " AS q_keep")
      .getOrElse("")
    ctes +=
      s"""d AS (
         |  SELECT did, grp, n_toks$keepCol
         |  FROM (
         |    SELECT ${cur.idColumn} AS did, ${cur.reportBy} AS grp,
         |      len($tk) AS n_toks$qualityCols
         |    FROM ${cur.table}))""".stripMargin
    val memberSql = cur.stages.map {
      case _: DedupExactStageDef    => "exact.did IS NOT NULL"
      case _: DedupNearStageDef     => "neardrop.did IS NULL"
      case _: QualityStageDef       => "q_keep"
      case _: DecontaminateStageDef => "contam.did IS NULL"
    }
    val sDefs = cur.stages.indices.map { i =>
      s"    (${memberSql.take(i + 1).mkString(" AND ")}) AS s${i + 1}"
    }.mkString(",\n")
    val joins = cur.stages.flatMap {
      case _: DedupExactStageDef    => Some("  LEFT JOIN exact ON d.did = exact.did")
      case _: DedupNearStageDef     => Some("  LEFT JOIN neardrop ON d.did = neardrop.did")
      case _: DecontaminateStageDef => Some("  LEFT JOIN contam ON d.did = contam.did")
      case _                        => None
    }.mkString("\n")
    ctes +=
      s"""s AS (
         |  SELECT d.*,
         |$sDefs
         |  FROM d
         |$joins)""".stripMargin
    val stageCounts = cur.stages.zipWithIndex.map { case (st, i) =>
      s"  count(CASE WHEN s${i + 1} THEN 1 END) AS n_${st.name},"
    }.mkString("\n")
    val prefix = if (hasNear) "WITH RECURSIVE " else "WITH "
    s"""$prefix${ctes.mkString(",\n")}
       |SELECT grp AS ${cur.reportBy}, count(*) AS n_raw,
       |$stageCounts
       |  CAST(sum(CASE WHEN s${cur.stages.size} THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS tokens_final
       |FROM s GROUP BY grp ORDER BY grp""".stripMargin
  }

  // ---------- q276: the declared funnel, gated end-to-end ----------

  /** q86's entire curation chain as ONE JSON document — the constants
    * are q86's (q61's rule table, q67's benchmark list), so the
    * declared funnel must reproduce the hand-composed one column for
    * column (CurationFlowSpec pins that equivalence; the DuckDB
    * oracle generated from this same string gates the interpretation
    * at the driver).
    */
  val declaredCurationJson: String =
    """{
      |  "curation": {
      |    "table": "documents",
      |    "id_column": "doc_id",
      |    "text_column": "text",
      |    "report_by": "source",
      |    "stages": [
      |      {"type": "dedup_exact", "name": "exact"},
      |      {"type": "dedup_near", "name": "neardup"},
      |      {"type": "quality_filter", "name": "quality", "rules": [
      |        {"reason": "too_short", "metric": "n_toks", "op": "lt", "value": 10},
      |        {"reason": "too_long", "metric": "n_toks", "op": "gt", "value": 1000},
      |        {"reason": "unknown_lang", "metric": "lang_det", "op": "eq", "value": "und"},
      |        {"reason": "low_quality", "metric": "quality", "op": "lt", "value": 0.4}]},
      |      {"type": "decontaminate", "name": "final", "shingles": [
      |        "the fast key", "spark group query", "join a filter",
      |        "window big merge", "hash value window"]}
      |    ]
      |  }
      |}""".stripMargin

  def q276_declared_curation(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, Metadata.parseCuration(declaredCurationJson))

  val q276_oracle: String =
    oracleSql(Metadata.parseCuration(declaredCurationJson))
}
