package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** The opt-in COUNT(DISTINCT) → HLL++ rewrite must (a) leave results
  * exact when the conf is off, (b) produce the sketch estimate inside
  * its accuracy contract when on, (c) actually remove the distinct from
  * the plan, and (d) not touch non-distinct aggregates.
  */
class ApproxDistinctRewriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def distinctUsers() = Tables.events(spark, sf)
    .groupBy(col("event_type"))
    .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))

  test("conf off: rule is inert, counts stay exact") {
    spark.experimental.extraOptimizations = Seq(ApproxDistinctRewrite(spark))
    try {
      spark.conf.set("spark.graft.approxDistinct", "false")
      val plan = distinctUsers().queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset("spark.graft.approxDistinct")
    }
  }

  test("conf on: distinct count becomes the sketch, inside its contract") {
    val exact = distinctUsers().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.experimental.extraOptimizations = Seq(ApproxDistinctRewrite(spark))
    try {
      spark.conf.set("spark.graft.approxDistinct", "true")
      val df = distinctUsers()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
      val approx = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, (u, n)) <- approx) {
        val (ue, ne) = exact(k)
        assert(n == ne, "plain COUNT is untouched")
        assert(math.abs(u - ue).toDouble <= ue * 0.10, s"$k: $u vs $ue")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset("spark.graft.approxDistinct")
    }
  }
}
