package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the event-analytics operators that the SQL oracle
  * equality can't state directly.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_funnel: stage counts are monotonically non-increasing") {
    val rows = AnalyticsQueries.qFunnel(spark, sf).collect()
    assert(rows.length == 3)
    val ns = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      s"funnel widened downstream: ${ns.toSeq}")
    assert(ns(0) > 0, "stage 1 empty — fixture has no views?")
  }

  test("q_retention_cohorts: offset-0 cell equals the cohort size") {
    val out = AnalyticsQueries.qRetentionCohorts(spark, sf).collect()
    val zero = out.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    // every user is active in their own first week by definition
    assert(zero == users, s"offset-0 total $zero != user count $users")
  }

  test("q_scd2_intervals: per user, intervals chain without gaps or overlap") {
    val out = AnalyticsQueries.qScd2Intervals(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_.getString(2))
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_.getBoolean(4)) == 1, s"user $uid: open-interval count != 1")
      assert(sorted.last.getBoolean(4), s"user $uid: current interval not last")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(3) == b.getString(2),
            s"user $uid: interval gap/overlap ${a.getString(3)} vs ${b.getString(2)}")
          // consecutive runs must change state, else they'd be one run
          assert(a.getString(1) != b.getString(1),
            s"user $uid: adjacent intervals share state ${a.getString(1)}")
        case _ => ()
      }
    }
  }

  test("q_alloc_largest_remainder: allocations sum exactly to the budget") {
    val out = AnalyticsQueries.qAllocLargestRemainder(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == 300L, s"allocation sum $total != budget 300")
    // proportionality sanity: every source with tokens gets >= base share
    assert(out.forall(_.getLong(2) >= 0L))
  }
}
