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
