package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** AQE posture audit: the batch paths run WITH adaptive execution — skew
  * splitting and post-shuffle partition coalescing are the two runtime
  * levers the 100 TB design leans on (BASELINE-pinned plans are built
  * declaratively; AQE is what right-sizes them against real data). This
  * spec fails if anyone turns the levers off session-wide, and pins that
  * the PlanSpec shapes survive AQE re-planning (the FINAL adaptive plan,
  * not just the initial static one, keeps its broadcasts and equi-joins).
  *
  * Stateful streaming queries are the documented exception: Spark
  * auto-disables AQE for them (MicroBatchExecution logs it) — nothing to
  * assert there.
  */
class AqePostureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("adaptive execution, skew-join, and partition coalescing are on for batch") {
    // the driver/bench sessions set adaptive.enabled explicitly
    // (Tables.localSession, Bench); the skew/coalesce sub-features ride
    // on Spark's defaults — this pins that no code path turned them off
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
  }

  /** Executes so AQE finalizes, then returns the FINAL adaptive plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("broadcast-join shapes survive AQE finalization (qd, decontaminate)") {
    val qd = finalPlan(RelationalQueries.qdJoinFilterCount(spark, sf))
    assert(qd.contains("AdaptiveSparkPlan"), "batch query did not plan adaptively")
    assert(qd.contains("isFinalPlan=true"))
    assert(qd.contains("BroadcastHashJoin"),
      s"AQE re-planning lost the dimension broadcast:\n$qd")
    val dec = finalPlan(PipelineQueries.qDecontaminate(spark, sf))
    assert(dec.contains("AdaptiveSparkPlan") && dec.contains("BroadcastHashJoin"))
    assert(!dec.contains("CartesianProduct"))
  }

  test("equi-join candidate generation survives AQE finalization (LSH dedup)") {
    val plan = finalPlan(SketchDedupQueries.qDedupMinhashLsh(spark, sf))
    assert(plan.contains("AdaptiveSparkPlan"))
    // the banded candidate join must stay a hash equi-join under the
    // final adaptive plan — a downgrade to nested-loop would be the
    // quadratic scale bug PlanSpec guards statically
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"LSH candidate join degraded under AQE:\n$plan")
  }

  test("AQE coalesces the over-provisioned post-shuffle partitions") {
    // 4-row groupBy under shuffle.partitions=4: AQE's coalescer should
    // collapse the post-shuffle side below the static setting — evidence
    // the lever is not just configured but operating
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v")
      .groupBy($"k").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") || plan.contains("coalesced"),
      s"no adaptive shuffle read in:\n$plan")
  }
}
