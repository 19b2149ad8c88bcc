package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the co-located-join layout (SURVEY.md §4.3 / the 100 TB design):
  * bucketing both sides of a recurring join key eliminates the shuffle
  * exchange entirely — at scale this is the difference between a daily
  * join re-shuffling 100 TB and reading co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set at session build (SparkSpec)
    spark.sql("DROP TABLE IF EXISTS b_violations")
    spark.sql("DROP TABLE IF EXISTS b_agencies")

    val violations = (1 to 1000)
      .map(i => (s"v$i", s"agency${i % 7}", 100.0 + i))
      .toDF("violation_id", "agency_id", "fine")
    val agencies = (0 until 7)
      .map(i => (s"agency$i", s"AGENCY NAME $i"))
      .toDF("agency_id", "agency_name")

    violations.write.bucketBy(4, "agency_id").sortBy("agency_id")
      .mode("overwrite").saveAsTable("b_violations")
    agencies.write.bucketBy(4, "agency_id").sortBy("agency_id")
      .mode("overwrite").saveAsTable("b_agencies")

    val joined = spark.table("b_violations")
      .join(spark.table("b_agencies").hint("merge"), "agency_id")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000)

    // sanity: the same join on plain (unbucketed) data does shuffle
    val plainPlan = violations.join(agencies.hint("merge"), "agency_id")
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange hashpartitioning"))
  }
}
