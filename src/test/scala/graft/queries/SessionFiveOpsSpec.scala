package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the fifth-session batch: interval-overlap join,
  * lag-k autocorrelation, BM25 ranking, count-min sketch,
  * sorted-neighborhood blocking, and the clustering-depth report.
  * The value-level gate is the DuckDB oracle; these pin the properties
  * the oracle can't express (dedup-free bucketing, one-sided sketch
  * error, bounded state, layout-quality ordering).
  */
class SessionFiveOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("overlapJoin emits each qualifying pair exactly once, matching the naive join") {
    import spark.implicits._
    // intervals long enough to span MANY buckets — the dedup trick
    // (emit only in the bucket of greatest start) is what's under test
    val left = Seq(
      (1L, "2024-01-01 00:10:00", "2024-01-01 07:50:00"),
      (2L, "2024-01-01 03:00:00", "2024-01-01 03:05:00"),
      (3L, "2024-01-02 00:00:00", "2024-01-02 00:30:00"))
      .toDF("lid", "ls", "le")
      .select(col("lid"), col("ls").cast("timestamp").as("l_start"),
        col("le").cast("timestamp").as("l_end"))
    val right = Seq(
      (10L, "2024-01-01 02:00:00", "2024-01-01 09:00:00"),
      (11L, "2024-01-01 07:49:00", "2024-01-01 07:51:00"),
      (12L, "2024-01-03 00:00:00", "2024-01-03 01:00:00"))
      .toDF("rid", "rs", "re")
      .select(col("rid"), col("rs").cast("timestamp").as("r_start"),
        col("re").cast("timestamp").as("r_end"))
    val got = graft.ops.RangeJoin
      .overlapJoin(left, right, "l_start", "l_end", "r_start", "r_end", 3600L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.crossJoin(right)
      .filter(col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "bucketized join emitted duplicates")
    assert(got.toSet === naive.toSet)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("count-min estimates are one-sided: est >= true for every probe") {
    val rows = CurationQueries.qCountmin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, est) = (r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"${r.getString(0)}: est $est < true $cnt")
    }
  }

  test("count-min sketch state is bounded by d*w cells regardless of corpus") {
    // the sketch aggregation the query builds over: at most 4*64 cells
    val cells = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", md5(concat(lit("cm:"), col("tok"))))
      .select(col("h"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket", expr(
        "cast(conv(substring(h, 8 * r + 1, 8), 16, 10) as bigint) % 64"))
      .groupBy("r", "bucket").count()
    assert(cells.count() <= 256)
  }

  test("autocorrelation r stays in [-1, 1]") {
    val rows = AnalyticsQueries.qAutocorr(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    rows.foreach { r =>
      if (!r.isNullAt(2))
        assert(math.abs(r.getDouble(2)) <= 1.0, s"lag ${r.getInt(0)}: |r| > 1")
    }
  }

  test("BM25 top-10 is rank-consistent and every hit count is in 1..3") {
    val rows = PipelineQueries.qBm25Topk(spark, sf).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not non-increasing in output order")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 3L)
    }
  }

  test("sorted-neighborhood pairs all verify at jaccard >= 0.6") {
    val rows = SketchDedupQueries.qSortedNeighborhood(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.6 - 1e-9)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("every dirty record resolves into the same entity as its true master") {
    val rows = CurationQueries.qErClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirty = rows.keys.filter(_ >= 1000000L)
    assert(dirty.nonEmpty)
    dirty.foreach { d =>
      val master = d - 1000000L
      assert(rows.contains(master), s"master $master of dirty $d not in any cluster")
      assert(rows(d) === rows(master),
        s"dirty $d (entity ${rows(d)}) split from master $master (entity ${rows(master)})")
    }
  }

  test("HITS scores equal the brute-force two-round computation") {
    val nodes = graft.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val m = nodes.max + 1
    val edges = nodes.toSeq.map(u => (u, (u * u + 7) % m)).filter(e => nodes(e._2))
    val auth1 = edges.groupBy(_._2).map { case (v, es) => v -> es.size.toLong }
    val hub1 = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => auth1.getOrElse(e._2, 0L)).sum }
    val auth2 = edges.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => hub1.getOrElse(e._1, 0L)).sum }
    val expected = nodes.toSeq
      .map(n => (n, auth2.getOrElse(n, 0L), hub1.getOrElse(n, 0L)))
      .sortBy { case (n, a, _) => (-a, n) }
      .take(15)
    val got = GraphQueries.qHits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("seasonal outliers flag exactly the days beyond 2x residual MAD") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1).toDouble, r.getInt(2)))
    val base = daily.groupBy(_._3).map { case (d, rs) => d -> medianOf(rs.map(_._2).toSeq) }
    val resid = daily.map { case (day, cnt, dow) => (day, cnt - base(dow)) }
    val mad = medianOf(resid.map(r => math.abs(r._2)).toSeq)
    val expected = resid.filter(r => math.abs(r._2) > 2.0 * mad).map(_._1).toSet
    val got = AnalyticsQueries.qSeasonalOutliers(spark, sf).collect()
      .map(_.getDate(0).toString).toSet
    assert(got === expected)
    assert(mad > 0.0)
  }

  test("frame sampling caps fan-out at 8 frames per document") {
    val perDoc = MultimodalQueries.qFrameSample(spark, sf).collect()
      .groupBy(_.getLong(0)).map(_._2.length)
    assert(perDoc.nonEmpty)
    assert(perDoc.max <= 8)
    assert(perDoc.max == 8, "fixture never exercises the cap — weaken detected")
  }

  test("equi-depth histogram buckets are balanced") {
    val counts = LakeOpsQueries.qHistogramStats(spark, sf).collect()
      .map(_.getLong(1))
    assert(counts.length === 8)
    assert(counts.max - counts.min <= 2,
      s"equi-depth buckets unbalanced: ${counts.mkString(",")}")
  }

  test("join-size estimate is self-consistent") {
    val r = LakeOpsQueries.qJoinEstimate(spark, sf).collect().head
    val (t, e, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(t > 0 && e > 0)
    val expectBp =
      if (e >= t) 10000 * (e - t) / t else -(10000 * (t - e) / t)
    assert(bp === expectBp)
  }

  test("novelty is 0 bp for a doc fully covered by the reference slice") {
    // reference docs themselves are excluded; but a candidate identical
    // to a reference doc would be 0 — assert the weaker invariants that
    // hold on any corpus: bp in [0, 10000], and some doc is fully novel
    val rows = CorpusOpsQueries.qNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L)
    }
    assert(rows.exists(_.getLong(2) < 10000L),
      "no candidate shares ANY shingle with the reference slice")
  }

  test("windowed CUSUM closed form equals the textbook recursion") {
    val rows = AnalyticsQueries.qCusumDrift(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val target = total / rows.length
    val slack = target / 20
    var s = 0L
    rows.foreach { case (day, cnt, got) =>
      s = math.max(0L, s + cnt - target - slack)
      assert(got === s, s"$day: closed form $got != recursion $s")
    }
  }

  test("assortativity is a valid correlation") {
    val r = GraphQueries.qAssortativity(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    if (!r.isNullAt(1)) assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("A-distinctive log-odds terms are relatively more frequent in A") {
    val rows = TextQueries.qLogOddsTerms(spark, sf).collect()
    assert(rows.length === 10)
    rows.filter(_.getString(4) == "A").foreach { r =>
      val (a, b, z) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(z > 0.0, s"${r.getString(0)}: A-side term with z <= 0")
      assert(a > 0L)
    }
    rows.filter(_.getString(4) == "B").foreach { r =>
      assert(r.getDouble(3) < 0.0, s"${r.getString(0)}: B-side term with z >= 0")
    }
  }

  test("clustered layout has no worse total depth than arrival layout") {
    val rows = LakeOpsQueries.qClusteringDepth(spark, sf).collect()
    val byLayout = rows.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(4)).sum }
    assert(byLayout.keySet === Set("arrival", "clustered"))
    assert(byLayout("clustered") <= byLayout("arrival"),
      s"re-clustering did not improve depth: $byLayout")
  }
}
