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

  test("q_tree_closure: chains are contiguous and terminate at the root") {
    val rows = AnalyticsQueries.qTreeClosure(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (node, anc) =>
      val depths = anc.map(_.getLong(2)).sorted
      assert(depths.head == 1L && depths.last == depths.length.toLong,
        s"node $node: depths not contiguous: ${depths.toSeq}")
      // deepest ancestor is the root (0 under parent = u div 3)
      val deepest = anc.maxBy(_.getLong(2)).getLong(1)
      assert(deepest == 0L, s"node $node: chain ends at $deepest, not the root")
      // each depth resolves to exactly one ancestor (it's a forest)
      assert(anc.map(_.getLong(2)).distinct.length == anc.length,
        s"node $node: duplicate depth in chain")
    }
    // doubling must cover depth > 2 (i.e. it actually iterated)
    assert(rows.map(_.getLong(2)).max > 2L, "fixture too shallow to exercise doubling")
  }

  test("q_mad_outliers: every flagged doc is outside its group's 2-MAD band") {
    val out = AnalyticsQueries.qMadOutliers(spark, sf).collect()
    out.foreach { r =>
      val (n, med, mad) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(n - med) > 2.0 * mad - 1e-6,
        s"doc ${r.getLong(0)} inside the band: |$n - $med| <= 3*$mad")
    }
  }

  test("q_markov_transitions: rows per prev sum to the pair count; p_bp sums to ~10000") {
    val rows = AnalyticsQueries.qMarkovTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val bp = rs.map(_.getLong(3)).sum
      // each truncating div loses < 1 bp per next-type
      assert(bp <= 10000 && bp > 10000 - rs.length,
        s"$prev: probabilities sum to $bp bp over ${rs.length} rows")
    }
    val nPairs = rows.map(_.getLong(2)).sum
    val nEvents = graft.Tables.events(spark, sf).count()
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(nPairs == nEvents - nUsers,
      s"pair count $nPairs != events - users (${nEvents - nUsers})")
  }

  test("q_peak_concurrency: peaks are positive and bounded by the day's arrivals") {
    val peaks = AnalyticsQueries.qPeakConcurrency(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(peaks.nonEmpty)
    val perDay = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    peaks.foreach { case (day, p) =>
      assert(p >= 1L, s"$day: non-positive peak")
      // intervals open during day D all started on D or carried over
      // midnight from D-1, so arrivals(D) + arrivals(D-1) bounds the peak
      val prev = java.sql.Timestamp.valueOf(day.toLocalDateTime.minusDays(1))
      val bound = perDay.getOrElse(day, 0L) + perDay.getOrElse(prev, 0L)
      assert(p <= bound, s"$day: peak $p exceeds arrivals+carry $bound")
    }
  }

  test("q_session_paths: paths have at most 5 hops and counts cover sessions") {
    val rows = AnalyticsQueries.qSessionPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val hops = r.getString(0).split(">")
      assert(hops.length <= 5 && hops.nonEmpty, s"bad path ${r.getString(0)}")
      hops.foreach(h => assert(
        Set("view", "click", "purchase", "signup", "error")(h), s"unknown type $h"))
    }
    val ns = rows.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse), "not sorted by frequency")
    val nSessions = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(ns.sum <= nSessions)
  }

  test("q_conversion_time: quantiles ordered, count matches funnel stage 2") {
    val r = AnalyticsQueries.qConversionTime(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) <= r.getDouble(2), "p50 > p90")
    assert(r.getDouble(1) >= 0.0)
    val funnelS2 = AnalyticsQueries.qFunnel(spark, sf).collect()
      .find(_.getInt(0) == 2).get.getLong(2)
    assert(r.getLong(0) == funnelS2,
      s"conversion count ${r.getLong(0)} != funnel stage 2 $funnelS2")
  }

  test("q_item_affinity: pair order canonical, lift arithmetic exact") {
    val rows = AnalyticsQueries.qItemAffinity(spark, sf).collect()
    assert(rows.nonEmpty)
    val nOrders = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { r =>
      val (pa, pb, nab, na, nb, lift) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pa < pb, s"pair not canonical: $pa >= $pb")
      assert(nab >= 2 && nab <= math.min(na, nb))
      assert(lift == 1000000L * nab * nOrders / (na * nb))
    }
  }

  test("q_ab_lift: arms partition the users and z sign tracks the rate gap") {
    val r = AnalyticsQueries.qAbLift(spark, sf).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(na + nb == nUsers)
    assert(ca <= na && cb <= nb)
    assert(ca > 0 && cb > 0 && ca < na && cb < nb,
      "conversion degenerate — z-score fixture broken")
    val z = r.getDouble(6)
    val gap = ca.toDouble / na - cb.toDouble / nb
    assert(z.sign == gap.sign || gap == 0.0)
  }

  test("q_alloc_largest_remainder: allocations sum exactly to the budget") {
    val out = AnalyticsQueries.qAllocLargestRemainder(spark, sf).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == 300L, s"allocation sum $total != budget 300")
    // proportionality sanity: every source with tokens gets >= base share
    assert(out.forall(_.getLong(2) >= 0L))
  }
}
