package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal
import graft.queries.{Analytics, BpeTrain, ChangeCapture, ChunkingQueries, ConsistencyQueries, CorpusProfileQueries, CorpusQueries, CurationQueries, DistributionQueries, EventQueries, ExtendedAnalytics, GovernanceQueries, GraphQueries, LanguageModel, MiningQueries, PipelineQueries, RelationalQueries, RetrievalQueries, RichnessQueries, ScrubQueries, StreamingParity, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q10_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ Analytics.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ CorpusQueries.queries ++
      GraphQueries.queries ++ ScrubQueries.queries ++ ExtendedAnalytics.queries ++
      DistributionQueries.queries ++ CurationQueries.queries ++
      EventQueries.queries ++ StreamingParity.queries ++
      RetrievalQueries.queries ++ ChangeCapture.queries ++
      BpeTrain.queries ++ Multimodal.queries ++ GovernanceQueries.queries ++
      LanguageModel.queries ++ MiningQueries.queries ++ RichnessQueries.queries ++
      ChunkingQueries.queries ++ RelationalQueries.queries ++
      ConsistencyQueries.queries ++ CorpusProfileQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    PipelineQueries.oracles ++ Analytics.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++ CorpusQueries.oracles ++
      GraphQueries.oracles ++ ScrubQueries.oracles ++ ExtendedAnalytics.oracles ++
      DistributionQueries.oracles ++ CurationQueries.oracles ++
      EventQueries.oracles ++ StreamingParity.oracles ++
      RetrievalQueries.oracles ++ ChangeCapture.oracles ++
      BpeTrain.oracles ++ Multimodal.oracles ++ GovernanceQueries.oracles ++
      LanguageModel.oracles ++ MiningQueries.oracles ++ RichnessQueries.oracles ++
      ChunkingQueries.oracles ++ RelationalQueries.oracles ++
      ConsistencyQueries.oracles ++ CorpusProfileQueries.oracles
}
