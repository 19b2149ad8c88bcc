package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** Pins the physical-plan shapes the 100 TB design depends on — a
  * regression here (lost pushdown, join downgraded to shuffle, codegen
  * broken) is a scale bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Executes the plan so AQE finalizes, then returns the executed plan
    * (codegen stages appear as `*(n)` only in the final plan).
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("qd: dimension side broadcasts; filter pushed into its parquet scan") {
    val plan = formatted(RelationalQueries.qdJoinFilterCount(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)")) // PushedFilters
    assert(!plan.contains("SortMergeJoin"))
  }

  test("qd: fact scan reads only the join column (pruning reached parquet)") {
    val plan = formatted(RelationalQueries.qdJoinFilterCount(spark, sf))
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint>"))
  }

  test("qb: shipdate range predicate is pushed to the parquet scan") {
    val plan = formatted(RelationalQueries.qbFilterCount(spark, sf))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("qa: aggregation is partial+final hash aggregate under codegen") {
    val df = RelationalQueries.qaCountByMonthPriority(spark, sf)
    assert(formatted(df).contains("partial_count"))
    val plan = finalPlan(df)
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("*(")) // whole-stage codegen stages present
  }

  test("qf: LIKE family pushed as StringContains filters on the part scan") {
    val plan = formatted(RelationalQueries.qfLikeSum(spark, sf))
    assert(plan.contains("StringContains(p_name,o"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  /** Physical plan, one node per line (countable, unlike `formatted`
    * which repeats each node in its detail section).
    */
  private def simple(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("ANN scale path: sign-LSH bucketed candidate join stays an equi-join") {
    val plan = simple(SimilarityQueries.qSimLshBucketed(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("embedding near-dup: banded blocking + fetch joins stay equi-joins") {
    val plan = simple(SimilarityQueries.qDedupEmbedding(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("IVF: only the bounded centroid assignment is a broadcast nested loop") {
    val plan = formatted(SimilarityQueries.qSimIvf(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    // one BNLJ node per 16-row broadcast centroid cross: per Lloyd
    // training iteration plus one terminal cross, in BOTH the index
    // -assignment branch and the query-probe branch (the static explain
    // prints the shared training subtree under each with fresh node ids;
    // at runtime the identical broadcast stages are reused). All
    // deliberate, bounded crosses; the inverted-list search itself must
    // be a hash/sort equi-join on cid.
    val bnljIds = raw"\((\d+)\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(bnljIds.size == 2 * (SimilarityQueries.IvfIters + 1))
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"))
  }

  test("IVF: centroid assignment is map-side only — no vec_id exchange") {
    val plan = formatted(SimilarityQueries.qSimIvf(spark, sf))
    // the ONLY Window in the whole plan is the final per-query top-k
    // rank (WindowGroupLimit nodes are its rank-limit pushdown, not
    // windows); every argmax-centroid pick (training iterations, index
    // assignment, probe selection) folds over the broadcast centroid
    // array PER ROW (optimization r16) — no groupBy(vec_id) aggregate,
    // hence no corpus-keyed exchange anywhere (the max_by form it
    // replaced shuffled one row per vector per use, since vec_id is
    // unique and partial aggregation collapsed nothing)
    val windowIds = raw"\((\d+)\) Window\b".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(windowIds.size == 1, s"expected 1 window (final top-k), got $windowIds")
    assert(!plan.contains("hashpartitioning(vec_id"),
      "centroid assignment must not shuffle the corpus by vec_id")
  }

  test("SemDeDup: within-cluster pair join is an equi-join on cid") {
    val plan = formatted(SimilarityQueries.qSemDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    // the only nested-loop joins are the bounded 16-row centroid crosses
    // (training iterations + terminal assignment); the pair generator —
    // the stage whose input is the whole corpus — must join on cid
    val bnljIds = raw"\((\d+)\) BroadcastNestedLoopJoin".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(bnljIds.size == SimilarityQueries.IvfIters + 1, s"got $bnljIds")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"))
  }

  test("repetition filter: per-row signals, no shuffle before the rollup") {
    val plan = simple(TextQueries.qRepetitionFilter(spark, sf))
    assert(!plan.contains("Join"))
    assert(!plan.contains("Window"))
    // exactly one hash exchange (partial -> final per-source agg); the
    // only other allowed exchange is the presentation sort's range one
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2)
  }

  test("as-of join is the union+window shape: no range explosion, no BNLJ") {
    val plan = simple(PipelineQueries.qAsofJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window")) // last-value carry-forward, one key shuffle
  }

  test("tfidf: the only non-equi join is the single-row corpus-count broadcast") {
    val plan = simple(PipelineQueries.qTfidfTopk(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1)
    assert(plan.linesIterator.exists(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin"))) // tf x df join stays equi
  }

  test("stratified sample is a plain filter over the scan (no shuffle before it)") {
    val df = PipelineQueries.qSampleStratified(spark, sf)
    val plan = simple(df)
    assert(!plan.contains("Join"))
    // the sampling predicate sits in a Filter directly over the file scan
    assert(plan.contains("Filter"))
  }

  test("decontaminate: the benchmark side broadcasts; no cartesian shapes") {
    val plan = simple(PipelineQueries.qDecontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bloom decontaminate: 8KiB filter broadcasts, exact check is a shuffle join") {
    val plan = simple(PipelineQueries.qDecontaminateBloom(spark, sf))
    // the bit array rides a broadcast nested loop (single-row build side);
    // the exact verification join must be the shuffle form — this
    // strategy exists for benchmark sides too big to broadcast
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      "exact check lost its shuffle form")
    assert(!plan.contains("CartesianProduct"))
  }

  test("boilerplate: hot-shingle set broadcasts; no corpus-wide second shuffle join") {
    val plan = simple(TextQueries.qBoilerplate(spark, sf))
    // the document-scoring join against the hot set must be broadcast —
    // a SortMergeJoin here would re-shuffle the whole shingled corpus
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("range join: bucketized containment stays a hash equi-join, no nested loop") {
    val plan = simple(RelationalQueries.qRangeJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the join carries the bucket in its equi-keys; containment is a
    // post-join filter, not a join condition driving a nested loop
    assert(plan.contains("_bucket"))
  }

  test("contamination fraction: benchmark set broadcasts, corpus never re-shuffles for scoring") {
    val plan = simple(CorpusOpsQueries.qContamFraction(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("vocab OOV: top-V vocabulary is a TakeOrdered, not a single-partition window") {
    val plan = simple(CorpusOpsQueries.qVocabOov(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("chunking is generate-only: zero exchanges before the output sort") {
    val plan = simple(CorpusOpsQueries.qChunkOverlap(spark, sf))
    // exactly the terminal orderBy's exchange; no join/agg shuffles
    assert("Exchange".r.findAllIn(plan).size == 1)
    assert(!plan.contains("Join"))
  }

  test("IVF-PQ: candidate path is equi-joins with bounded broadcasts only") {
    val plan = simple(PqQueries.qSimIvfPq(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    // the only BNLJs are the bounded 16-row coarse-centroid crosses:
    // (training iterations + 1 terminal cross) appearing in BOTH the
    // index-assignment and probe-selection lineages — same structure
    // q_sim_ivf pins
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size ==
      2 * (SimilarityQueries.IvfIters + 1))
  }

  test("hard negatives: partial top-k aggregates map-side (no window exchange)") {
    val plan = simple(SimilarityQueries.qHardNegatives(spark, sf))
    assert(!plan.contains("Window"))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }

  test("contrastive pairs: map-side max_by argmaxes, no window exchange") {
    val plan = simple(SimilarityQueries.qContrastivePairs(spark, sf))
    assert(!plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_max"))
  }

  test("kNN label noise: bucket join stays equi, vote aggregates map-side") {
    val plan = simple(SimilarityQueries.qKnnLabelNoise(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
  }

  test("nDCG: ranks come from TakeOrdered, never a global-rank window") {
    val plan = simple(PipelineQueries.qNdcgEval(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("target encoding: cohort stats broadcast back, no window") {
    val plan = simple(FeatureQueries.qTargetEncodeLoo(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("contribution cap: two combinable aggregations, no sort or window") {
    val plan = simple(AnalyticsQueries.qContribCap(spark, sf))
    assert(!plan.contains("Window"))
    assert(formatted(AnalyticsQueries.qContribCap(spark, sf)).contains("partial_"))
  }

  test("covariance: map-side partial aggregation bounds the shuffle at d^2 cells") {
    val plan = formatted(CorpusOpsQueries.qEmbedCovariance(spark, sf))
    assert(plan.contains("partial_"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bucketed join is exchange-free on the join key (SMB layout)") {
    val plan = simple(RelationalQueries.qBucketedJoin(spark, sf))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    // the ONLY exchanges are the post-join aggregation + output sort —
    // nothing re-partitions on the join key (both sides read pre-bucketed)
    assert(!plan.contains("hashpartitioning(o_custkey"))
    assert(!plan.contains("hashpartitioning(c_custkey"))
  }

  test("date-partitioned lake: a month filter prunes partitions at plan time") {
    import org.apache.spark.sql.functions.{col, count, date_format, lit}
    val lake = java.nio.file.Files.createTempDirectory("graft_part").toString + "/orders"
    try {
      graft.Tables.orders(spark, sf)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.partitionBy("order_month").parquet(lake)
      val months = spark.read.parquet(lake)
        .select(col("order_month")).distinct().count()
      assert(months > 1, "fixture spans multiple months")
      val q = spark.read.parquet(lake)
        .filter(col("order_month") === "1997-03")
        .agg(count(lit(1)))
      val plan = formatted(q)
      // the month predicate must be a PartitionFilter on the scan (never
      // a post-scan Filter over all partitions)
      assert(plan.contains("PartitionFilters") &&
        plan.matches("(?s).*PartitionFilters: \\[[^\\]]*order_month[^\\]]*\\].*"), plan)
      // and the scan must actually read one partition's files
      val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
        .mkString
      assert(!scanned.contains("1997-04"), "other months' directories pruned")
    } finally {
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(lake).getParent)
    }
  }

  test("custom FieldExpr stays inside whole-stage codegen in qc") {
    val df = RelationalQueries.qcWeekdayAvg(spark, sf)
    val plan = finalPlan(df)
    // Catalyst folds the FieldExpr projection into the final
    // HashAggregate's result expressions; that node must carry the
    // `*(n)` whole-stage-codegen marker
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("weekday_num") && l.contains("*(")))
    assert(df.collect().length == 7)
  }
}
