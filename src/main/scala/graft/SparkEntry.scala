package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CorpusOpsQueries, CurationQueries,
  FeatureQueries, FunctionQueries, GraphQueries, IncrementalDedupQueries, LakeOpsQueries,
  MultimodalQueries, PipelineQueries, PqQueries, RelationalQueries,
  SimilarityQueries, SketchDedupQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-data-pipeline extensions) to a DataFrame builder over the
  * testdata tables; `oracleSql` holds the equivalent DuckDB SQL for the
  * driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query (Qd analog: fact-to-dimension broadcast join + filter +
    * aggregate — the reference's own flagship, README.md:45-51) on sf=0.001.
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.qdJoinFilterCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Each entry builds under [[CacheScope.scopedBuild]]: the persisted
    * intermediates the PREVIOUS entry registered are dropped before this
    * one builds, so a long-lived session running many queries holds at
    * most one query's cache (round-10 ADVICE: the shingle-base /
    * signature / normalized-embedding persists otherwise accumulate
    * corpus-scale frames). Consume each returned plan before building
    * the next to keep the persist benefit; interleaved build-build-run
    * stays correct but recomputes.
    *
    * Builds are lazy (no jobs) with these exceptions, which run
    * corpus-scale work at build time: q_langid_nb (collects the language
    * inventory to generate score columns) and every connected-components
    * consumer — q_dedup_components / q_dedup_apply /
    * q_dedup_cluster_stats / q_er_clusters — whose exact fixpoint loop
    * cannot live inside one lazy plan (see
    * [[graft.ops.ConnectedComponents.components]]; the same applies to
    * CorpusPipeline chains that include dedupNear*).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (n, f) =>
      n -> ((s: SparkSession, d: String) => CacheScope.scopedBuild(s)(f(s, d)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ FunctionQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      SketchDedupQueries.queries ++ IncrementalDedupQueries.queries ++
      StreamingQueries.queries ++ MultimodalQueries.queries ++
      PipelineQueries.queries ++ PqQueries.queries ++
      CorpusOpsQueries.queries ++ LakeOpsQueries.queries ++
      CurationQueries.queries ++ AnalyticsQueries.queries ++
      GraphQueries.queries ++ FeatureQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ FunctionQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++
      SketchDedupQueries.oracles ++ IncrementalDedupQueries.oracles ++
      StreamingQueries.oracles ++ MultimodalQueries.oracles ++
      PipelineQueries.oracles ++ PqQueries.oracles ++
      CorpusOpsQueries.oracles ++ LakeOpsQueries.oracles ++
      CurationQueries.oracles ++ AnalyticsQueries.oracles ++
      GraphQueries.oracles ++ FeatureQueries.oracles
}
