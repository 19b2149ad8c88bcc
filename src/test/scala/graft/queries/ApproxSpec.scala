package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Sketch aggregates (HLL++): no DuckDB oracle — sketch implementations
  * differ across engines — so accuracy is pinned against the exact
  * distinct count instead. At 100 TB approx_count_distinct replaces the
  * exact countDistinct's full shuffle with fixed-size sketches merged
  * map-side.
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    val both = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("approx quantiles bracket the exact median") {
    val vals = Tables.events(spark, sf)
    val Array(q25, q50, q75) =
      vals.stat.approxQuantile("value", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 <= q50 && q50 <= q75)
    val exactMedian = vals.orderBy(col("value"))
      .select(col("value")).collect().map(_.getDouble(0))
    val mid = exactMedian(exactMedian.length / 2)
    assert(math.abs(q50 - mid) / math.max(1.0, math.abs(mid)) < 0.1)
  }
}
