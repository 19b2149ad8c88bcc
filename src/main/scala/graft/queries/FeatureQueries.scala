package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Feature-store operators: the transforms a training pipeline runs to
  * attach model features to events — point-in-time-correct dimension
  * lookup, trailing-window aggregates, deterministic negative sampling,
  * and an exponentially-weighted moving average.
  *
  * Determinism: every feature is integer-exact (counts, micro-units,
  * integer weights) or order-insensitive (max), so the DuckDB oracle
  * matches bit-for-bit; nothing depends on accumulation order.
  */
object FeatureQueries {

  // --- point-in-time (PIT) join ---
  // The feature-store correctness rule: a training row built at fact
  // time t may only see dimension state with valid_from <= t — anything
  // later leaks the future into the features. State here is the user's
  // latest signup/error event ("account status stream"); facts are
  // purchases. Implemented as the as-of union trick: tag state rows 0
  // and fact rows 1, sort each user's merged timeline once, and carry
  // the last seen state forward — ONE shuffle on user_id, no inequality
  // join, no per-fact probe. A state change at exactly t applies to t
  // (tag 0 sorts first).
  def qPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val states = e.filter(col("event_type").isin("signup", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("tag"), col("event_type").as("state"))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("tag"), lit(null).cast("string").as("state"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    states.unionAll(facts)
      .withColumn("state_at", last(col("state"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("state_at"), lit("none")).as("state_at"))
      .orderBy(col("event_id"))
  }

  val qPitJoinOracle: String =
    """WITH tl AS (
      |  SELECT user_id, ts, event_id, 0 AS tag, event_type AS state
      |  FROM events WHERE event_type IN ('signup', 'error')
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 1 AS tag, NULL AS state
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT *, last_value(state IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, tag, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state_at
      |  FROM tl)
      |SELECT event_id, user_id, ts, coalesce(state_at, 'none') AS state_at
      |FROM c WHERE tag = 1 ORDER BY event_id""".stripMargin

  // --- trailing-window features (RANGE frame) ---
  // "How active was this user in the 7 days before this purchase" — the
  // canonical trailing feature, computed with a VALUE-based range frame
  // over integer epoch seconds (deterministic under timestamp ties,
  // unlike a row frame). Features are a count and an order-insensitive
  // max, so no accumulation-order hazard; windows are computed over the
  // full per-user timeline, then only fact rows are kept.
  def qTrailingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val horizon = 7L * 86400L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-horizon, 0)
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("tsec", expr("unix_micros(ts) div 1000000"))
      .withColumn("n_events_7d", count(lit(1)).over(w))
      .withColumn("n_purchases_7d",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
      .withColumn("max_value_7d", max(col("value")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("n_events_7d"), col("n_purchases_7d"), col("max_value_7d"))
      .orderBy(col("event_id"))
  }

  val qTrailingFeaturesOracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, value,
      |         epoch_us(ts) // 1000000 AS tsec
      |  FROM events),
      |f AS (
      |  SELECT event_id, user_id, event_type,
      |         count(*) OVER w AS n_events_7d,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |              OVER w AS BIGINT) AS n_purchases_7d,
      |         max(value) OVER w AS max_value_7d
      |  FROM t
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec
      |               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, n_events_7d, n_purchases_7d, max_value_7d
      |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // --- deterministic negative sampling ---
  // Recommendation training needs (user, item-they-did-NOT-buy) pairs.
  // Candidates come from the portable salted-md5 hash (8 per customer),
  // existence-checked against `part`, purged of true interactions with
  // an anti-join, and the first 3 surviving candidates per customer (by
  // draw index, then part key) are kept. Everything is equi-join +
  // bounded explode: 8 candidate rows per user, never |users| × |parts|.
  def qNegativeSample(spark: SparkSession, dir: String): DataFrame = {
    val bought = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct()
    val maxPart = part(spark, dir).agg(max(col("p_partkey")).as("mp"))
    val cands = customer(spark, dir).select(col("c_custkey").as("custkey"))
      .select(col("custkey"), explode(expr("sequence(0, 7)")).as("i"))
      .crossJoin(broadcast(maxPart))
      .withColumn("partkey", graft.functions.Md5Hash60Expr.of(concat(
        lit("neg11:"), col("custkey").cast("string"), lit(":"),
        col("i").cast("string"))) % col("mp") + 1L)
      .join(part(spark, dir).select(col("p_partkey").as("partkey")),
        Seq("partkey"), "left_semi")
      .groupBy(col("custkey"), col("partkey")).agg(min(col("i")).as("i"))
    cands.join(bought, Seq("custkey", "partkey"), "left_anti")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("custkey")).orderBy(col("i"), col("partkey"))))
      .filter(col("rk") <= 3)
      .select(col("custkey"), col("partkey"), col("rk"))
      .orderBy(col("custkey"), col("rk"))
  }

  val qNegativeSampleOracle: String =
    """WITH bought AS (
      |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |mp AS (SELECT max(p_partkey) AS mp FROM part),
      |cands AS (
      |  SELECT c.c_custkey AS custkey, d.i,
      |         CAST('0x' || substr(md5('neg11:' || CAST(c.c_custkey AS VARCHAR)
      |           || ':' || CAST(d.i AS VARCHAR)), 1, 15) AS BIGINT) % mp.mp + 1 AS partkey
      |  FROM customer c CROSS JOIN (SELECT unnest(range(0, 8)) AS i) d
      |  CROSS JOIN mp),
      |ex AS (
      |  SELECT cands.custkey, cands.partkey, min(cands.i) AS i
      |  FROM cands
      |  WHERE cands.partkey IN (SELECT p_partkey FROM part)
      |  GROUP BY 1, 2),
      |neg AS (
      |  SELECT e.custkey, e.partkey, e.i,
      |         CAST(row_number() OVER (PARTITION BY e.custkey
      |                                 ORDER BY e.i, e.partkey) AS INT) AS rk
      |  FROM ex e ANTI JOIN bought b
      |    ON e.custkey = b.custkey AND e.partkey = b.partkey)
      |SELECT custkey, partkey, rk FROM neg WHERE rk <= 3
      |ORDER BY custkey, rk""".stripMargin

  // --- exponentially-weighted moving average (integer-exact) ---
  // Per-user EWMA of the last 8 purchase values with decay 0.9, done
  // entirely in integers: 0.9^j scaled by 1e7 is a whole number for
  // j <= 7, so the weight table is a literal CASE and the average is
  // (Σ value_micros·w) div (Σ w). No pow(), no floating-point decay —
  // the usual EWMA cross-engine drift is impossible by construction.
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val weightCase =
      """CASE rn WHEN 1 THEN 10000000 WHEN 2 THEN 9000000 WHEN 3 THEN 8100000
        | WHEN 4 THEN 7290000 WHEN 5 THEN 6561000 WHEN 6 THEN 5904900
        | WHEN 7 THEN 5314410 ELSE 4782969 END""".stripMargin
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .select(col("user_id"),
        expr("cast(round(value * 1000000) as bigint)").as("vm"),
        expr(weightCase).as("wt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_used"),
        expr("sum(vm * wt) div sum(wt)").as("ewma_micros"))
      .orderBy(col("user_id"))
  }

  val qEwmaOracle: String =
    """WITH p AS (
      |  SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS vm,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase'),
      |k AS (
      |  SELECT user_id, vm,
      |         CASE rn WHEN 1 THEN 10000000 WHEN 2 THEN 9000000
      |                 WHEN 3 THEN 8100000 WHEN 4 THEN 7290000
      |                 WHEN 5 THEN 6561000 WHEN 6 THEN 5904900
      |                 WHEN 7 THEN 5314410 ELSE 4782969 END AS wt
      |  FROM p WHERE rn <= 8)
      |SELECT user_id, count(*) AS n_used,
      |       CAST(sum(vm * wt) AS BIGINT) // CAST(sum(wt) AS BIGINT) AS ewma_micros
      |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin

  /** name -> query builder, for SparkEntry. */
  // --- weight-of-evidence binning ---
  // The credit-scoring / tabular-ML feature transform: decile-bin a
  // numeric feature, score each bin by WOE = ln(good-share / bad-share)
  // with half-count smoothing, and report each bin's information-value
  // term. Counts are exact integers; the smoothed odds ratio is formed
  // as ONE exact rational ((2g+1)·B) / ((2b+1)·G) so the single ln()
  // evaluates the same double in both engines (the autocorr/ab_lift
  // double-once discipline), rounded to 5. Bin boundaries come from one
  // percentile aggregate broadcast to a codegen'd array filter — no
  // range join, same plan family as q_histogram_stats.
  def qWoeBinning(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("t"))
    val bounds = e.agg(expr(
      "percentile(value, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))")
      .as("bs"))
    val binned = e.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("size(filter(bs, b -> value > b)) + 1"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("good"))
      .withColumn("bad", col("n") - col("good"))
    val tot = binned.agg(sum(col("good")).as("g_tot"), sum(col("bad")).as("b_tot"))
    binned.crossJoin(broadcast(tot))
      .withColumn("woe_e5", expr(
        "round(ln(((2 * good + 1) * CAST(b_tot AS DOUBLE)) / ((2 * bad + 1) * CAST(g_tot AS DOUBLE))), 5)"))
      .withColumn("iv_e5", expr(
        "round((good * CAST(b_tot AS DOUBLE) - bad * CAST(g_tot AS DOUBLE)) / (CAST(g_tot AS DOUBLE) * b_tot) * woe_e5, 5)"))
      .select(col("bin").cast("int").as("bin"), col("n"), col("good"),
        col("bad"), col("woe_e5"), col("iv_e5"))
      .orderBy(col("bin"))
  }

  val qWoeBinningOracle: String =
    """WITH e AS (
      |  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t
      |  FROM events),
      |b AS (
      |  SELECT quantile_cont(value,
      |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      |  FROM e),
      |r AS (
      |  SELECT t, len(list_filter(bs, x -> value > x)) + 1 AS bin
      |  FROM e CROSS JOIN b),
      |g AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS good,
      |         CAST(count(*) - sum(t) AS BIGINT) AS bad
      |  FROM r GROUP BY 1),
      |tot AS (SELECT CAST(sum(good) AS BIGINT) AS g_tot,
      |               CAST(sum(bad) AS BIGINT) AS b_tot FROM g),
      |w AS (
      |  SELECT bin, n, good, bad,
      |         round(ln(((2 * good + 1) * CAST(b_tot AS DOUBLE))
      |               / ((2 * bad + 1) * CAST(g_tot AS DOUBLE))), 5) AS woe_e5,
      |         g_tot, b_tot
      |  FROM g CROSS JOIN tot)
      |SELECT CAST(bin AS INTEGER) AS bin, n, good, bad, woe_e5,
      |       round((good * CAST(b_tot AS DOUBLE) - bad * CAST(g_tot AS DOUBLE))
      |             / (CAST(g_tot AS DOUBLE) * b_tot) * woe_e5, 5) AS iv_e5
      |FROM w ORDER BY bin""".stripMargin

  // --- leave-one-out target encoding ---
  // Mean-target encoding with the standard leakage guard: each row's
  // encoding excludes its OWN target ((S - t) / (n - 1)), so the
  // feature never contains the row's label. Cohorts with one member
  // fall back to the global prior. Everything is integer ppm with
  // truncating division over non-negative operands; the per-cohort
  // stats are one map-side-combinable aggregation broadcast back (50
  // cohorts — at higher cardinality the join is a plain shuffle
  // equi-join, same plan). Output bounded to a deterministic 5% row
  // sample for the gate.
  def qTargetEncodeLoo(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_id"), (col("user_id") % 50).as("cat"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("t"))
    val stats = e.groupBy(col("cat"))
      .agg(sum(col("t")).as("s"), count(lit(1)).as("n"))
    val prior = e.agg(sum(col("t")).as("gs"), count(lit(1)).as("gn"))
    e.join(broadcast(stats), "cat")
      .crossJoin(broadcast(prior))
      .withColumn("loo_ppm",
        expr("""CASE WHEN n > 1 THEN 1000000 * (s - t) div (n - 1)
               |     ELSE 1000000 * gs div gn END""".stripMargin))
      .filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("cat"), col("t"), col("loo_ppm"))
      .orderBy(col("event_id"))
  }

  val qTargetEncodeLooOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id % 50 AS cat,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t
      |  FROM events),
      |s AS (
      |  SELECT cat, CAST(sum(t) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      |  FROM e GROUP BY 1),
      |p AS (SELECT CAST(sum(t) AS BIGINT) AS gs, CAST(count(*) AS BIGINT) AS gn FROM e)
      |SELECT e.event_id, e.cat, CAST(e.t AS BIGINT) AS t,
      |       CAST(CASE WHEN s.n > 1 THEN 1000000 * (s.s - e.t) // (s.n - 1)
      |                 ELSE 1000000 * p.gs // p.gn END AS BIGINT) AS loo_ppm
      |FROM e JOIN s USING (cat) CROSS JOIN p
      |WHERE e.event_id % 20 = 0 ORDER BY e.event_id""".stripMargin

  // --- population stability index (PSI) ---
  // THE model-monitoring drift metric for scored features: bin the
  // reference and current populations on the REFERENCE's deciles and
  // sum (p - q)·ln(p/q). Halves come from event-id parity; Laplace
  // half-counts keep empty bins finite. Counts are exact integers; the
  // per-bin term is one double expression over those integers rounded
  // to 8 and decimal-summed (the q_dist_drift discipline), so shuffle
  // order can't move the total. PSI > 0.2 is the conventional
  // "investigate" line — reported as the flag.
  def qPsi(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("value"), (col("event_id") % 2).as("half"))
    val bounds = e.filter(col("half") === 0).agg(expr(
      "percentile(value, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))")
      .as("bs"))
    val binned = e.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("size(filter(bs, b -> value > b)) + 1"))
    val cRef = binned.filter(col("half") === 0)
      .groupBy(col("bin")).agg(count(lit(1)).as("c_ref"))
    val cCur = binned.filter(col("half") === 1)
      .groupBy(col("bin")).agg(count(lit(1)).as("c_cur"))
    val tot = binned.agg(
      sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
    val terms = spark.range(1, 11).select(col("id").cast("int").as("bin"))
      .join(cRef, Seq("bin"), "left")
      .join(cCur, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        ((coalesce(col("c_ref"), lit(0L)) * 2 + 1).cast("double") /
          (col("n_ref") * 2 + 10)).as("p"),
        ((coalesce(col("c_cur"), lit(0L)) * 2 + 1).cast("double") /
          (col("n_cur") * 2 + 10)).as("q"))
      .withColumn("term",
        round((col("p") - col("q")) * log(col("p") / col("q")), 8)
          .cast("decimal(28,8)"))
    terms.groupBy(col("n_ref"), col("n_cur"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"),
        max_by(col("bin"), struct(abs(col("term")), (-col("bin")).as("nb")))
          .as("worst_bin"))
      .withColumn("drifted", col("psi") > 0.2)
      .select(col("n_ref"), col("n_cur"), col("psi"), col("worst_bin"),
        col("drifted"))
  }

  val qPsiOracle: String =
    """WITH e AS (
      |  SELECT value, event_id % 2 AS half FROM events),
      |b AS (
      |  SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      |  FROM e WHERE half = 0),
      |r AS (
      |  SELECT half, len(list_filter(bs, x -> value > x)) + 1 AS bin
      |  FROM e CROSS JOIN b),
      |cr AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_ref FROM r WHERE half = 0 GROUP BY 1),
      |cc AS (SELECT bin, CAST(count(*) AS BIGINT) AS c_cur FROM r WHERE half = 1 GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM r),
      |g AS (SELECT unnest(generate_series(1, 10)) AS bin),
      |terms AS (
      |  SELECT g.bin, n_ref, n_cur,
      |         CAST((coalesce(c_ref, 0) * 2 + 1) AS DOUBLE) / (n_ref * 2 + 10) AS p,
      |         CAST((coalesce(c_cur, 0) * 2 + 1) AS DOUBLE) / (n_cur * 2 + 10) AS q
      |  FROM g LEFT JOIN cr ON g.bin = cr.bin LEFT JOIN cc ON g.bin = cc.bin
      |  CROSS JOIN t),
      |tt AS (
      |  SELECT bin, n_ref, n_cur,
      |         CAST(round((p - q) * ln(p / q), 8) AS DECIMAL(28,8)) AS term
      |  FROM terms),
      |w AS (
      |  SELECT bin AS worst_bin FROM tt
      |  QUALIFY row_number() OVER (ORDER BY abs(term) DESC, bin) = 1)
      |SELECT n_ref, n_cur,
      |       round(CAST(sum(term) AS DOUBLE), 6) AS psi,
      |       CAST(any_value(w.worst_bin) AS INT) AS worst_bin,
      |       round(CAST(sum(term) AS DOUBLE), 6) > 0.2 AS drifted
      |FROM tt CROSS JOIN w GROUP BY 1, 2""".stripMargin

  // --- temporal train/test split with leakage audit ---
  // Time-series models must split by TIME, not by hash — a random split
  // leaks future rows into training. Cut at the exact interpolated 80th
  // percentile of event time (integer epoch seconds; percentile is the
  // engines' shared interpolated definition, floored back to a second),
  // then audit what a modeler must know: per-split row counts and time
  // ranges, and the user-overlap count — users active on both sides of
  // the cut, whose per-user features must be computed strictly
  // before-the-cut to stay leak-free. One scan + two aggregations;
  // the cut is a broadcast scalar.
  def qTemporalSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000000").as("tsec"))
    val cut = e.agg(expr("CAST(floor(percentile(tsec, 0.8)) AS BIGINT)").as("cut"))
    val tagged = e.crossJoin(broadcast(cut))
      .withColumn("split", when(col("tsec") <= col("cut"), "train").otherwise("test"))
    val perSplit = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("tsec")).as("min_tsec"), max(col("tsec")).as("max_tsec"))
    val overlap = tagged.select(col("split"), col("user_id")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
      .filter(col("k") === 2)
      .agg(count(lit(1)).as("n"))
    perSplit.crossJoin(broadcast(overlap))
      .select(col("split"), col("n_rows"), col("n_users"),
        col("min_tsec"), col("max_tsec"),
        col("n").as("n_overlap_users"))
      .orderBy(col("split"))
  }

  val qTemporalSplitOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS tsec FROM events),
      |c AS (SELECT CAST(floor(quantile_cont(tsec, 0.8)) AS BIGINT) AS cut FROM e),
      |t AS (
      |  SELECT event_id, user_id, tsec,
      |         CASE WHEN tsec <= cut THEN 'train' ELSE 'test' END AS split
      |  FROM e CROSS JOIN c),
      |ps AS (
      |  SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |         CAST(min(tsec) AS BIGINT) AS min_tsec,
      |         CAST(max(tsec) AS BIGINT) AS max_tsec
      |  FROM t GROUP BY 1),
      |ov AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT user_id FROM (SELECT DISTINCT split, user_id FROM t)
      |    GROUP BY 1 HAVING count(*) = 2))
      |SELECT split, n_rows, n_users, min_tsec, max_tsec,
      |       ov.n AS n_overlap_users
      |FROM ps CROSS JOIN ov ORDER BY split""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_temporal_split" -> (qTemporalSplit _),
    "q_psi" -> (qPsi _),
    "q_woe_binning" -> (qWoeBinning _),
    "q_target_encode_loo" -> (qTargetEncodeLoo _),
    "q_pit_join" -> (qPitJoin _),
    "q_trailing_features" -> (qTrailingFeatures _),
    "q_negative_sample" -> (qNegativeSample _),
    "q_ewma" -> (qEwma _))

  /** name -> DuckDB oracle SQL, for the driver gate. */
  def oracles: Map[String, String] = Map(
    "q_psi" -> qPsiOracle,
    "q_temporal_split" -> qTemporalSplitOracle,
    "q_woe_binning" -> qWoeBinningOracle,
    "q_target_encode_loo" -> qTargetEncodeLooOracle,
    "q_pit_join" -> qPitJoinOracle,
    "q_trailing_features" -> qTrailingFeaturesOracle,
    "q_negative_sample" -> qNegativeSampleOracle,
    "q_ewma" -> qEwmaOracle)
}
