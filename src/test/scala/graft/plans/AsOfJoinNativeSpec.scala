package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native as-of operator must agree bit-for-bit with the
  * union+window formulation (they also share the DuckDB ASOF oracle at
  * the gate), plan through the custom exec with co-partitioned sorted
  * children, and handle the no-match edge as LEFT OUTER.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native exec output == union+window output on the gated query") {
    val native = graft.queries.PipelineQueries.qAsofNative(spark, sf)
      .collect().map(_.toSeq)
    val window = graft.queries.PipelineQueries.qAsofJoin(spark, sf)
      .collect().map(_.toSeq)
    assert(native.length == window.length && native.nonEmpty)
    assert(native.toSeq == window.toSeq)
  }

  test("plans through AsOfJoinExec with sorted co-partitioned children") {
    val df = graft.queries.PipelineQueries.qAsofNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // exec nodes print without the Exec suffix
    assert(plan.contains("Sort"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }

  test("left outer semantics: keys with no earlier right rows get nulls") {
    val left = Seq((1L, 10L, "a"), (2L, 5L, "b"), (3L, 7L, "c"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 8L, 100L), (1L, 10L, 101L), (3L, 9L, 300L))
      .toDF("rk", "rt", "rv")
    val out = AsOfJoinNative.asof(left, right, "k", "rk", "t", "rt")
      .orderBy(col("k"))
      .collect()
    // k=1: rt=10 ties t=10 -> inclusive match 101; k=2: no rows -> null;
    // k=3: rt=9 > t=7 -> null
    assert(out(0).getLong(5) == 101L)
    assert(out(1).isNullAt(5))
    assert(out(2).isNullAt(5))
  }
}
