package graft

/** Ad-hoc scale probe: runs the candidate-generation-heavy operators on an
  * enlarged corpus and reports timings + result sizes — the "would this
  * hold at 10x" check for every quadratic-risk pipeline.
  * Usage: sbt "runMain graft.ScaleProbe /tmp/docs10x [ops...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs10x")
    val which = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def on(n: String) = which.isEmpty || which(n)
    val spark = Tables.localSession(cores = 32)
    def time(name: String)(f: => Long): Unit = if (on(name)) {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("dedup_exact")(queries.TextQueries.qDedupExact(spark, dir).count())
    time("dedup_minhash_lsh")(queries.SketchDedupQueries.qDedupMinhashLsh(spark, dir).count())
    time("dedup_simhash")(queries.SketchDedupQueries.qDedupSimhash(spark, dir).count())
    time("dedup_ngram_jaccard")(queries.TextQueries.qDedupNgramJaccard(spark, dir).count())
    time("text_fingerprint")(queries.TextQueries.qTextFingerprint(spark, dir).count())
    time("dedup_embedding")(queries.SimilarityQueries.qDedupEmbedding(spark, dir).count())
    time("sim_lsh_bucketed")(queries.SimilarityQueries.qSimLshBucketed(spark, dir).count())
    time("tfidf_topk")(queries.PipelineQueries.qTfidfTopk(spark, dir).count())
    time("asof_join")(queries.PipelineQueries.qAsofJoin(spark, dir).count())
    time("dedup_components")(queries.SketchDedupQueries.qDedupComponents(spark, dir).count())
    time("dedup_incremental")(queries.IncrementalDedupQueries.qDedupIncremental(spark, dir).count())
    time("decontaminate")(queries.PipelineQueries.qDecontaminate(spark, dir).count())
    time("exact_substr")(queries.CorpusOpsQueries.qExactSubstr(spark, dir).count())
    time("chunk_overlap")(queries.CorpusOpsQueries.qChunkOverlap(spark, dir).count())
    time("vocab_oov")(queries.CorpusOpsQueries.qVocabOov(spark, dir).count())
    time("embed_covariance")(queries.CorpusOpsQueries.qEmbedCovariance(spark, dir).count())
    time("sim_ivfpq")(queries.PqQueries.qSimIvfPq(spark, dir).count())
    time("hard_negatives")(queries.SimilarityQueries.qHardNegatives(spark, dir).count())
    time("dedup_containment")(queries.CorpusOpsQueries.qDedupContainment(spark, dir).count())
    time("perplexity")(queries.CurationQueries.qPerplexity(spark, dir).count())
    time("dist_drift")(queries.CurationQueries.qDistDrift(spark, dir).count())
    time("fuzzy_match")(queries.CurationQueries.qFuzzyMatch(spark, dir).count())
    time("gap_fill")(queries.LakeOpsQueries.qGapFill(spark, dir).count())
    time("heavy_hitters")(queries.LakeOpsQueries.qHeavyHitters(spark, dir).count())
    time("compaction_plan")(queries.LakeOpsQueries.qCompactionPlan(spark, dir).count())
    time("tree_closure")(queries.AnalyticsQueries.qTreeClosure(spark, dir).count())
    time("pagerank")(queries.GraphQueries.qPagerank(spark, dir).count())
    time("triangle_count")(queries.GraphQueries.qTriangleCount(spark, dir).count())
    time("markov_transitions")(queries.AnalyticsQueries.qMarkovTransitions(spark, dir).count())
    time("peak_concurrency")(queries.AnalyticsQueries.qPeakConcurrency(spark, dir).count())
    time("session_paths")(queries.AnalyticsQueries.qSessionPaths(spark, dir).count())
    time("item_affinity")(queries.AnalyticsQueries.qItemAffinity(spark, dir).count())
    time("sorted_neighborhood")(queries.SketchDedupQueries.qSortedNeighborhood(spark, dir).count())
    time("bm25_topk")(queries.PipelineQueries.qBm25Topk(spark, dir).count())
    time("countmin")(queries.CurationQueries.qCountmin(spark, dir).count())
    time("interval_join")(queries.AnalyticsQueries.qIntervalJoin(spark, dir).count())
    time("autocorr")(queries.AnalyticsQueries.qAutocorr(spark, dir).count())
    time("clustering_depth")(queries.LakeOpsQueries.qClusteringDepth(spark, dir).count())
    time("er_clusters")(queries.CurationQueries.qErClusters(spark, dir).count())
    time("hits")(queries.GraphQueries.qHits(spark, dir).count())
    time("seasonal_outliers")(queries.AnalyticsQueries.qSeasonalOutliers(spark, dir).count())
    time("novelty")(queries.CorpusOpsQueries.qNovelty(spark, dir).count())
    time("histogram_stats")(queries.LakeOpsQueries.qHistogramStats(spark, dir).count())
    time("join_estimate")(queries.LakeOpsQueries.qJoinEstimate(spark, dir).count())
    time("time_travel")(queries.LakeOpsQueries.qTimeTravel(spark, dir).count())
    time("scd2_apply")(queries.LakeOpsQueries.qScd2Apply(spark, dir).count())
    time("balanced_sample")(queries.PipelineQueries.qBalancedSample(spark, dir).count())
    time("frame_sample")(queries.MultimodalQueries.qFrameSample(spark, dir).count())
    spark.stop()
  }
}
