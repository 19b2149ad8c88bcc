package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Data-lake maintenance and observability operators: date-spine gap
  * filling (the engine-side generalization of the reference's per-day
  * gap semantics, SURVEY §2.9 ST4), snapshot diffing for incremental
  * loads, small-file compaction planning, and bounded-state heavy-hitter
  * detection.
  *
  * 100 TB shape: gap filling shuffles once on the series key and the
  * spine explode is bounded by the date span; the snapshot diff is one
  * full-outer hash join on the primary key; compaction planning is one
  * window over (partition, file) order; heavy hitters keep O(k) state
  * per partition and merge sketches associatively.
  */
object LakeOpsQueries {

  // --- date-spine gap filling + forward fill ---
  // The reference loads weather and violations day by day and documents
  // what a missed day means (SURVEY §2.9 ST4: gaps stay empty, a backfill
  // must be explicit). This operator makes gaps FIRST-CLASS: build each
  // user's full daily spine with `sequence(min_day, max_day)`, left-join
  // the observed daily aggregate, mark the holes, and forward-fill the
  // last observation (`last(_, ignoreNulls = true)` over a running
  // frame). One shuffle on user_id; the explode is bounded by span days,
  // not corpus size, so a 1000-executor run partitions by series key and
  // never materializes a global calendar.
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("day_value"))
    val spine = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine
      .join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        last(col("day_value"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled_value"),
        col("day_value").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  val qGapFillOracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 4) AS day_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(
      |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span)
      |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
      |       last_value(d.day_value IGNORE NULLS) OVER (
      |         PARTITION BY s.user_id ORDER BY s.day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |       d.day_value IS NULL AS is_gap
      |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      |ORDER BY 1, 2""".stripMargin

  // --- snapshot diff: added / removed / changed / unchanged ---
  // The audit companion to the upsert sink (etl/Sinks.scala): given two
  // snapshots of the same keyed table, classify every key with ONE
  // full-outer hash join — the standard "what did this load change"
  // report an incremental pipeline runs after every merge. Snapshots are
  // carved deterministically from `orders` (old = keys not divisible by
  // 97, new = keys not divisible by 89, with every 7th price perturbed
  // by +1.0 — an exact double add, so the change predicate needs no
  // rounding). Classification compares columns directly rather than
  // hashing concatenated values: double→string formatting differs across
  // engines, column equality doesn't.
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val old = o.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k_old"), col("o_totalprice").as("price_old"),
        col("o_orderstatus").as("status_old"))
    val neu = o.filter(col("o_orderkey") % 89 =!= 0)
      .select(col("o_orderkey").as("k_new"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("price_new"),
        col("o_orderstatus").as("status_new"))
    old.join(neu, col("k_old") === col("k_new"), "full_outer")
      .withColumn("change_type",
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("price_old") =!= col("price_new") ||
            col("status_old") =!= col("status_new"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"),
        min(coalesce(col("k_old"), col("k_new"))).as("min_key"),
        max(coalesce(col("k_old"), col("k_new"))).as("max_key"))
      .orderBy(col("change_type"))
  }

  val qSnapshotDiffOracle: String =
    """WITH old AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 97 != 0),
      |neu AS (
      |  SELECT o_orderkey AS k,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
      |              ELSE o_totalprice END AS price,
      |         o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 89 != 0),
      |d AS (
      |  SELECT CASE WHEN old.k IS NULL THEN 'added'
      |              WHEN neu.k IS NULL THEN 'removed'
      |              WHEN old.price != neu.price OR old.status != neu.status THEN 'changed'
      |              ELSE 'unchanged' END AS change_type,
      |         coalesce(old.k, neu.k) AS k
      |  FROM old FULL OUTER JOIN neu ON old.k = neu.k)
      |SELECT change_type, count(*) AS n_keys, min(k) AS min_key, max(k) AS max_key
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // --- small-file compaction planning ---
  // At 100 TB the lake accumulates small files (every incremental load
  // writes a few); compaction groups them into ~target-size rewrite
  // bins. Files here are the documents table (source = lake partition,
  // doc_id = file, n_chars = bytes). Assignment is by START OFFSET: a
  // file whose preceding cumulative size is `c` lands in bin `c div T` —
  // one window per partition in stable (doc_id) order, integer-exact in
  // both engines (operands are non-negative, so Spark's truncating `div`
  // and DuckDB's flooring `//` agree). Offset binning can overshoot a
  // bin by at most one file — the standard trade for a single-pass plan
  // (an exact first-fit packer is inherently sequential).
  private val CompactTarget = 1500L

  def qCompactionPlan(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("start_off",
        coalesce(
          sum(col("n_chars")).over(
            Window.partitionBy(col("source")).orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bin_id", expr(s"start_off div $CompactTarget"))
      .groupBy(col("source"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bin_bytes"),
        min(col("doc_id")).as("first_file"), max(col("doc_id")).as("last_file"))
      .orderBy(col("source"), col("bin_id"))

  val qCompactionPlanOracle: String =
    s"""WITH f AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(coalesce(sum(n_chars) OVER (
       |           PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM documents)
       |SELECT source, start_off // $CompactTarget AS bin_id,
       |       count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
       |       min(doc_id) AS first_file, max(doc_id) AS last_file
       |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- heavy hitters: Misra-Gries sketch, gated on its guarantee ---
  // "Which keys dominate this column" with O(k) state instead of a full
  // groupBy of the tail — the first question against a skewed 100 TB
  // join key. The key stream is deterministically skewed (2/3 of events
  // collapse onto user_id % 7 → seven hot keys; the rest keep their
  // user_id → a ~150-key tail), so the k=16 sketch must actually evict.
  // Like q_distinct_approx / q_percentile_approx the sketch CONTENTS are
  // engine-specific (tail membership depends on arrival order), so the
  // gate checks the deterministic CONTRACT (Misra & Gries 1982): every
  // key with true frequency > N/k MUST be in the sketch. The output is
  // the exact heavy set (integer-exact `freq * k > N` threshold, no
  // division) with its sketch-membership bit, which the oracle asserts
  // is constant TRUE.
  private val MgK = 16

  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val keyed = events(spark, dir)
      .select(
        when(col("event_id") % 3 =!= 0, (col("user_id") % 7).cast("string"))
          .otherwise(col("user_id").cast("string")).as("key"))
    val mg = udaf(new graft.functions.MisraGries(MgK))
    val sketch = keyed.agg(mg(col("key")).as("cand"))
    val totals = keyed.agg(count(lit(1)).as("n_total"))
    keyed
      .groupBy(col("key"))
      .agg(count(lit(1)).as("freq"))
      .join(broadcast(totals), lit(true))
      .filter(col("freq") * MgK > col("n_total"))
      .join(broadcast(sketch), lit(true))
      .select(col("key"), col("freq"),
        array_contains(col("cand"), col("key")).as("in_sketch"))
      .orderBy(col("freq").desc, col("key"))
  }

  val qHeavyHittersOracle: String =
    s"""WITH keyed AS (
       |  SELECT CASE WHEN event_id % 3 != 0 THEN CAST(user_id % 7 AS VARCHAR)
       |              ELSE CAST(user_id AS VARCHAR) END AS key
       |  FROM events),
       |tot AS (SELECT count(*) AS n_total FROM keyed)
       |SELECT key, count(*) AS freq, TRUE AS in_sketch
       |FROM keyed, tot GROUP BY key, n_total
       |HAVING count(*) * $MgK > n_total
       |ORDER BY freq DESC, key""".stripMargin

  // --- CDC log application ---
  // The remaining lakehouse write primitive next to upsert/insert-ignore
  // (etl/Sinks.scala) and the snapshot diff: replay an ordered
  // change-data-capture log (insert / update / delete with a sequence
  // number) into final table state. The log is carved deterministically
  // from orders — every key inserts at seq 1, every 3rd key updates at
  // seq 2 (price + 10.0, an exact double add), every 7th key deletes at
  // seq 3 — so keys carry 1-3 log entries and every op type is
  // exercised, including update-then-delete. Application is the
  // standard shape: latest entry per key under the total (seq DESC)
  // order wins, deletes drop out. ONE shuffle on the key; at 100 TB the
  // log partitions by key and the window never sees more than one key's
  // entries together. No tie ambiguity: seq is unique per key.
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    val ins = o.select(col("k"), lit("I").as("op"), lit(1L).as("seq"),
      col("price"), col("status"))
    val upd = o.filter(col("k") % 3 === 0)
      .select(col("k"), lit("U").as("op"), lit(2L).as("seq"),
        (col("price") + 10.0).as("price"), col("status"))
    val del = o.filter(col("k") % 7 === 0)
      .select(col("k"), lit("D").as("op"), lit(3L).as("seq"),
        lit(null).cast("double").as("price"), lit(null).cast("string").as("status"))
    ins.unionAll(upd).unionAll(del)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("k").as("o_orderkey"), col("price"), col("status"))
      .orderBy(col("o_orderkey"))
  }

  val qCdcApplyOracle: String =
    """WITH log AS (
      |  SELECT o_orderkey AS k, 'I' AS op, 1 AS seq,
      |         o_totalprice AS price, o_orderstatus AS status FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'U', 2, o_totalprice + 10.0, o_orderstatus
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', 3, NULL, NULL
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |  FROM log)
      |SELECT k AS o_orderkey, price, status
      |FROM latest WHERE rn = 1 AND op != 'D'
      |ORDER BY o_orderkey""".stripMargin

  // --- time travel: table state AS OF each point in the CDC log ---
  // The lakehouse snapshot query next to q_cdc_apply's final-state
  // replay: reconstruct the table as of EVERY sequence point (seq <= S
  // for S in 1..3) and report per-snapshot row count + decimal-summed
  // price total. One log scan per snapshot boundary at gate scale; a
  // table format does this with manifest pointers, the ENGINE semantics
  // (latest-entry-per-key up to S, deletes drop) are what's gated here.
  // The price total routes through decimal(18,2) — the house recipe for
  // order-insensitive double sums.
  def qTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val log = o.select(col("k"), lit("I").as("op"), lit(1L).as("seq"), col("price"))
      .unionAll(o.filter(col("k") % 3 === 0)
        .select(col("k"), lit("U").as("op"), lit(2L).as("seq"),
          (col("price") + 10.0).as("price")))
      .unionAll(o.filter(col("k") % 7 === 0)
        .select(col("k"), lit("D").as("op"), lit(3L).as("seq"),
          lit(null).cast("double").as("price")))
    val snaps = spark.range(1, 4).select(col("id").as("snapshot"))
    log.crossJoin(broadcast(snaps))
      .filter(col("seq") <= col("snapshot"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("snapshot"), col("k")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy(col("snapshot"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double"), 2).as("total_price"))
      .orderBy(col("snapshot"))
  }

  val qTimeTravelOracle: String =
    """WITH log AS (
      |  SELECT o_orderkey AS k, 'I' AS op, 1 AS seq, o_totalprice AS price
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'U', 2, o_totalprice + 10.0
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', 3, NULL
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |x AS (
      |  SELECT s.snapshot, log.*,
      |         row_number() OVER (PARTITION BY s.snapshot, log.k
      |                            ORDER BY log.seq DESC) AS rn
      |  FROM log CROSS JOIN (SELECT unnest([1, 2, 3]) AS snapshot) s
      |  WHERE log.seq <= s.snapshot)
      |SELECT CAST(snapshot AS BIGINT) AS snapshot,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       round(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
      |FROM x WHERE rn = 1 AND op != 'D'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- SCD2 MERGE: apply a changes batch to a type-2 dimension ---
  // The dimension-maintenance write: a changes feed (customers ≡ 0
  // mod 5 move to segment PROMO effective 2024-06-01) hits a current
  // SCD2 table (every customer open since 2024-01-01). Semantics:
  // close the changed keys' open intervals at the effective date, and
  // append the new open rows; unchanged keys pass through untouched.
  // Shape: ONE equi-join of the dim against the broadcast-size changes
  // batch decides close-vs-carry per row, and the new rows are the
  // changes batch itself — no window, no full-table rewrite of
  // unchanged history (at 100 TB the join prunes to affected
  // partitions). This is the write path whose READ side is
  // q_scd2_intervals and whose point-in-time lookup is q_pit_join.
  // Open intervals use the conventional 9999-12-31 sentinel rather than
  // NULL — the standard SCD2 encoding (BETWEEN probes need no NULL
  // branch), and it keeps the date column NULL-free.
  def qScd2Apply(spark: SparkSession, dir: String): DataFrame = {
    val openEnd = to_date(lit("9999-12-31"))
    val dim = customer(spark, dir)
      .select(col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        to_date(lit("2024-01-01")).as("valid_from"),
        openEnd.as("valid_to"))
    val changes = customer(spark, dir)
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("custkey"),
        lit("PROMO").as("segment"),
        to_date(lit("2024-06-01")).as("valid_from"),
        openEnd.as("valid_to"))
    val changedKeys = changes.select(col("custkey")).withColumn("chg", lit(1))
    val existing = dim.join(broadcast(changedKeys), Seq("custkey"), "left")
      .select(col("custkey"), col("segment"), col("valid_from"),
        when(col("chg") === 1, to_date(lit("2024-06-01")))
          .otherwise(col("valid_to")).as("valid_to"))
    existing.unionByName(changes)
      .withColumn("is_current", col("valid_to") === openEnd)
      .orderBy(col("custkey"), col("valid_from"))
  }

  val qScd2ApplyOracle: String =
    """WITH dim AS (
      |  SELECT c_custkey AS custkey, c_mktsegment AS segment,
      |         DATE '2024-01-01' AS valid_from, DATE '9999-12-31' AS valid_to
      |  FROM customer),
      |changes AS (
      |  SELECT c_custkey AS custkey, 'PROMO' AS segment,
      |         DATE '2024-06-01' AS valid_from, DATE '9999-12-31' AS valid_to
      |  FROM customer WHERE c_custkey % 5 = 0),
      |existing AS (
      |  SELECT d.custkey, d.segment, d.valid_from,
      |         CASE WHEN c.custkey IS NOT NULL THEN DATE '2024-06-01'
      |              ELSE d.valid_to END AS valid_to
      |  FROM dim d LEFT JOIN (SELECT DISTINCT custkey FROM changes) c
      |    ON d.custkey = c.custkey),
      |merged AS (
      |  SELECT * FROM existing UNION ALL SELECT * FROM changes)
      |SELECT custkey, segment, valid_from, valid_to,
      |       valid_to = DATE '9999-12-31' AS is_current
      |FROM merged ORDER BY custkey, valid_from""".stripMargin

  // --- file-pruning stats: point lookups per layout ---
  // The payoff view of q_clustering_depth: for 8 point predicates on
  // the clustering key, how many files must a reader open under the
  // arrival vs re-clustered layout? files_read(probe) = #files whose
  // [min, max] contains it — the planner's manifest-pruning arithmetic,
  // computed on file metadata only. The re-clustered layout reads ~1
  // file per probe; arrival reads ~all of them.
  def qPruningStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents(spark, dir).select(col("doc_id"), col("n_chars"))
    def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
      d.withColumn("file_id", ntile(16).over(Window.orderBy(order: _*)))
        .groupBy(col("file_id"))
        .agg(min(col("n_chars")).as("f_min"), max(col("n_chars")).as("f_max"))
        .withColumn("layout", lit(name))
    val files = layout("arrival", Seq(col("doc_id")))
      .unionByName(layout("clustered", Seq(col("n_chars"), col("doc_id"))))
    val probes = spark.range(1, 9).select((col("id") * 64).as("probe"))
    files.crossJoin(broadcast(probes))
      .filter(col("f_min") <= col("probe") && col("probe") <= col("f_max"))
      .groupBy(col("layout"), col("probe"))
      .agg(count(lit(1)).as("files_read"))
      .orderBy(col("layout"), col("probe"))
  }

  val qPruningStatsOracle: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |fa AS (
      |  SELECT ntile(16) OVER (ORDER BY doc_id) AS file_id, n_chars FROM d),
      |fc AS (
      |  SELECT ntile(16) OVER (ORDER BY n_chars, doc_id) AS file_id, n_chars FROM d),
      |files AS (
      |  SELECT 'arrival' AS layout, file_id, min(n_chars) AS f_min,
      |         max(n_chars) AS f_max FROM fa GROUP BY 2
      |  UNION ALL
      |  SELECT 'clustered' AS layout, file_id, min(n_chars) AS f_min,
      |         max(n_chars) AS f_max FROM fc GROUP BY 2),
      |probes AS (SELECT unnest([64, 128, 192, 256, 320, 384, 448, 512]) AS probe)
      |SELECT f.layout, CAST(p.probe AS BIGINT) AS probe,
      |       CAST(count(*) AS BIGINT) AS files_read
      |FROM files f JOIN probes p
      |  ON f.f_min <= p.probe AND p.probe <= f.f_max
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // --- referential-integrity audit (orphan scan) ---
  // The post-load FK check a lake needs after every ingest: anti-join
  // each fact table against its dimension snapshot and report orphan
  // rates. The fixture simulates a partially-lost dimension (customers
  // ending in 3, orders ≡ 2 mod 7 dropped) so the audit actually finds
  // orphans at gate scale. Anti joins are plain shuffle equi-joins —
  // at 100 TB each relation audit is one join on its key, and the
  // basis-point rate stays integer-exact.
  def qRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def audit(fact: DataFrame, factKey: String, dim: DataFrame,
        dimKey: String, fkName: String): DataFrame =
      fact.select(col(factKey).as("k"))
        .join(dim.select(col(dimKey).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(fact.agg(count(lit(1)).as("n_total")))
        .select(lit(fkName).as("fk"), col("n_orphans"), col("n_total"),
          expr("(10000 * n_orphans) div n_total").as("orphan_bp"))
    val custSnap = customer(spark, dir).filter(col("c_custkey") % 10 =!= 3)
    val ordSnap = orders(spark, dir).filter(col("o_orderkey") % 7 =!= 2)
    audit(orders(spark, dir), "o_custkey", custSnap, "c_custkey",
        "orders->customer")
      .unionAll(audit(lineitem(spark, dir), "l_orderkey", ordSnap, "o_orderkey",
        "lineitem->orders"))
      .orderBy(col("fk"))
  }

  val qRefIntegrityOracle: String =
    """WITH cs AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 != 3),
      |os AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 != 2),
      |r AS (
      |  SELECT 'orders->customer' AS fk,
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM cs WHERE cs.c_custkey = o.o_custkey)) AS n_orphans,
      |         (SELECT count(*) FROM orders) AS n_total
      |  UNION ALL
      |  SELECT 'lineitem->orders' AS fk,
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM os WHERE os.o_orderkey = l.l_orderkey)) AS n_orphans,
      |         (SELECT count(*) FROM lineitem) AS n_total)
      |SELECT fk, n_orphans, n_total, (10000 * n_orphans) // n_total AS orphan_bp
      |FROM r ORDER BY fk""".stripMargin

  // --- table profiling (ANALYZE-style statistics collection) ---
  // The stats a cost-based optimizer or data-quality monitor wants after
  // every load: row count, null count, exact NDV, min/max per column —
  // in ONE pass over the table (a single multi-aggregate; Spark plans
  // the three count-distincts via one Expand, still one scan), reshaped
  // to one row per column with stack(). Profiled columns are integer- or
  // string-typed so the min/max stringification is engine-portable
  // (doubles would format differently).
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    // NOT spread (optimization r15, recorded negative): the expand for
    // the three count-distincts runs in the single-split scan stage, but
    // a round-robin spread A/B'd 1.15x WORSE solo — the shuffle costs
    // more than the warm single-threaded expand at this size.
    orders(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("nn1"),
        countDistinct(col("o_orderkey")).as("nd1"),
        min(col("o_orderkey")).cast("string").as("mn1"),
        max(col("o_orderkey")).cast("string").as("mx1"),
        count(col("o_custkey")).as("nn2"),
        countDistinct(col("o_custkey")).as("nd2"),
        min(col("o_custkey")).cast("string").as("mn2"),
        max(col("o_custkey")).cast("string").as("mx2"),
        count(col("o_orderpriority")).as("nn3"),
        countDistinct(col("o_orderpriority")).as("nd3"),
        min(col("o_orderpriority")).cast("string").as("mn3"),
        max(col("o_orderpriority")).cast("string").as("mx3"))
      .selectExpr(
        """stack(3,
          |  'o_orderkey',      n, n - nn1, nd1, mn1, mx1,
          |  'o_custkey',       n, n - nn2, nd2, mn2, mx2,
          |  'o_orderpriority', n, n - nn3, nd3, mn3, mx3)
          | AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)""".stripMargin)
      .orderBy(col("col_name"))

  val qProfileOracle: String =
    """WITH a AS (
      |  SELECT count(*) AS n,
      |         count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
      |         CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
      |         count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
      |         CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
      |         count(o_orderpriority) AS nn3, count(DISTINCT o_orderpriority) AS nd3,
      |         CAST(min(o_orderpriority) AS VARCHAR) AS mn3, CAST(max(o_orderpriority) AS VARCHAR) AS mx3
      |  FROM orders)
      |SELECT 'o_orderkey' AS col_name, n AS n_rows, n - nn1 AS n_nulls,
      |       nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
      |UNION ALL
      |SELECT 'o_custkey', n, n - nn2, nd2, mn2, mx2 FROM a
      |UNION ALL
      |SELECT 'o_orderpriority', n, n - nn3, nd3, mn3, mx3 FROM a
      |ORDER BY col_name""".stripMargin

  /** name -> query builder, for SparkEntry. */
  // --- equi-depth histogram (ANALYZE statistics collection) ---
  // The planner-statistics histogram: 8 equi-depth buckets over
  // o_totalprice, boundaries at the interpolated octiles, per-bucket
  // row counts + actual [min, max]. Scale shape: boundary computation
  // is one percentile aggregate; bucket ASSIGNMENT broadcasts the
  // 7-element boundary array and ranks each row with a codegen'd
  // array filter — no range join, no per-bucket scan. The same
  // unrounded boundaries drive the comparison in both engines (the
  // established percentile-determinism recipe); output bounds are
  // rounded once for display.
  def qHistogramStats(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_totalprice"))
    val bounds = o.agg(expr(
      "percentile(o_totalprice, array(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875))")
      .as("bs"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr("size(filter(bs, b -> o_totalprice > b)) + 1"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))
  }

  val qHistogramStatsOracle: String =
    """WITH b AS (
      |  SELECT quantile_cont(o_totalprice,
      |           [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
      |  FROM orders),
      |r AS (
      |  SELECT o_totalprice,
      |         len(list_filter(bs, x -> o_totalprice > x)) + 1 AS bucket
      |  FROM orders CROSS JOIN b)
      |SELECT CAST(bucket AS INTEGER) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       round(min(o_totalprice), 2) AS lo,
      |       round(max(o_totalprice), 2) AS hi
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // --- join-cardinality estimation by key-universe sampling ---
  // The optimizer-statistics technique for join sizing: sample the KEY
  // UNIVERSE (md5(key) % 16 == 0), not rows — both sides keep ALL rows
  // of a sampled key, so matching pairs survive together and
  // est = pairs_on_sampled_keys × 16 is unbiased for the true join
  // size (row-level Bernoulli sampling would need ×16² and has far
  // higher variance on skewed keys). Everything is integer-exact; the
  // report carries the true size next to the estimate with the signed
  // error in basis points — the accuracy statement IS the result.
  def qJoinEstimate(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"))
    val l = lineitem(spark, dir).select(col("l_orderkey"))
    val trueSize = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("true_pairs"))
    def sampled(df: DataFrame, key: String) = df.filter(expr(
      s"cast(conv(substring(md5(concat('js:', cast($key as string))), 1, 15), 16, 10) as bigint) % 16 = 0"))
    val estSize = sampled(o, "o_orderkey")
      .join(sampled(l, "l_orderkey"), col("o_orderkey") === col("l_orderkey"))
      .agg((count(lit(1)) * 16L).as("est_pairs"))
    trueSize.crossJoin(estSize)
      .select(col("true_pairs"), col("est_pairs"),
        // signed error with NON-NEGATIVE div operands only: Spark `div`
        // truncates toward zero while DuckDB `//` floors, so negatives
        // must never reach the division (house gotcha)
        expr("""CASE WHEN est_pairs >= true_pairs
               |  THEN (10000 * (est_pairs - true_pairs)) div true_pairs
               |  ELSE -((10000 * (true_pairs - est_pairs)) div true_pairs)
               |END""".stripMargin).as("err_bp"))
  }

  val qJoinEstimateOracle: String =
    """WITH t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS true_pairs
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |so AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE CAST('0x' || substr(md5('js:' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 16 = 0),
      |sl AS (
      |  SELECT l_orderkey FROM lineitem
      |  WHERE CAST('0x' || substr(md5('js:' || CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 16 = 0),
      |e AS (
      |  SELECT CAST(count(*) * 16 AS BIGINT) AS est_pairs
      |  FROM so JOIN sl ON so.o_orderkey = sl.l_orderkey)
      |SELECT true_pairs, est_pairs,
      |       CASE WHEN est_pairs >= true_pairs
      |         THEN (10000 * (est_pairs - true_pairs)) // true_pairs
      |         ELSE -((10000 * (true_pairs - est_pairs)) // true_pairs)
      |       END AS err_bp
      |FROM t CROSS JOIN e""".stripMargin

  // --- clustering-depth report: how well does a file layout skip? ---
  // The metric behind Delta/Iceberg OPTIMIZE decisions: per file, how
  // many files' [min, max] ranges of the clustering key overlap it —
  // i.e. how many files a point lookup on that key range must read.
  // A perfectly clustered layout has depth 1 (plus boundary ties); an
  // arrival-ordered layout approaches depth = #files because every file
  // spans the whole key range. Computed for BOTH layouts over the same
  // corpus (16 synthetic files each, key = n_chars) so the report shows
  // the re-cluster win. Scale shape: per-file min/max is one
  // aggregation (at 100 TB these come free from parquet footers /
  // the table manifest), and the overlap count runs on file METADATA —
  // 16 rows per layout, not data rows — exactly how a table-format
  // planner evaluates layouts. File assignment here uses ntile over a
  // global order to make the synthetic layout deterministic; a real
  // writer assigns files, it is not a data-path window.
  def qClusteringDepth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents(spark, dir).select(col("doc_id"), col("n_chars"))
    def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
      d.withColumn("file_id", ntile(16).over(Window.orderBy(order: _*)))
        .groupBy(col("file_id"))
        .agg(min(col("n_chars")).as("f_min"), max(col("n_chars")).as("f_max"))
        .withColumn("layout", lit(name))
    val files = layout("arrival", Seq(col("doc_id")))
      .unionByName(layout("clustered", Seq(col("n_chars"), col("doc_id"))))
    files.as("a")
      .join(files.as("b"),
        col("a.layout") === col("b.layout")
          && col("a.f_min") <= col("b.f_max") && col("b.f_min") <= col("a.f_max"))
      .groupBy(col("a.layout").as("layout"), col("a.file_id").as("file_id"),
        col("a.f_min").as("f_min"), col("a.f_max").as("f_max"))
      .agg(count(lit(1)).as("depth"))
      .orderBy(col("layout"), col("file_id"))
  }

  val qClusteringDepthOracle: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |fa AS (
      |  SELECT ntile(16) OVER (ORDER BY doc_id) AS file_id, n_chars FROM d),
      |fc AS (
      |  SELECT ntile(16) OVER (ORDER BY n_chars, doc_id) AS file_id, n_chars FROM d),
      |files AS (
      |  SELECT 'arrival' AS layout, file_id, min(n_chars) AS f_min,
      |         max(n_chars) AS f_max FROM fa GROUP BY 2
      |  UNION ALL
      |  SELECT 'clustered' AS layout, file_id, min(n_chars) AS f_min,
      |         max(n_chars) AS f_max FROM fc GROUP BY 2)
      |SELECT a.layout, CAST(a.file_id AS INTEGER) AS file_id,
      |       a.f_min, a.f_max, CAST(count(*) AS BIGINT) AS depth
      |FROM files a JOIN files b
      |  ON a.layout = b.layout AND a.f_min <= b.f_max AND b.f_min <= a.f_max
      |GROUP BY 1, 2, a.f_min, a.f_max
      |ORDER BY a.layout, file_id""".stripMargin

  // --- Benford first-digit audit ---
  // The classic synthetic-data / fraud screen: natural multi-scale
  // amounts follow log10(1 + 1/d) first-digit frequencies; fabricated
  // or truncated columns don't. Amounts convert to integer cents first
  // (round half-up on a positive double agrees across engines) so the
  // leading digit comes from INTEGER-to-string formatting — identical
  // everywhere — never from double formatting. Expected shares are 9
  // constants inlined in ppm at plan build (same numbers in the oracle);
  // deviation is observed_ppm - expected_ppm, all integer. One
  // map-side-combinable aggregation over the scan.
  private val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.round(1e6 * math.log10(1.0 + 1.0 / d)))

  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val expSql = BenfordPpm.map { case (d, p) => s"($d, ${p}L)" }.mkString(", ")
    val expected = spark.sql(s"SELECT * FROM VALUES $expSql AS t(digit, exp_ppm)")
    val obs = lineitem(spark, dir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("total"))
    obs.join(broadcast(expected), Seq("digit"), "right")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        expr("1000000 * coalesce(n_obs, 0) div total").as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  val qBenfordOracle: String = {
    val expSql = BenfordPpm.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH c AS (
       |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
       |  FROM lineitem),
       |o AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
       |         CAST(count(*) AS BIGINT) AS n_obs
       |  FROM c WHERE cents > 0 GROUP BY 1),
       |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM o),
       |e AS (SELECT * FROM (VALUES $expSql) v(digit, exp_ppm))
       |SELECT e.digit, coalesce(o.n_obs, 0) AS n_obs,
       |       CAST(1000000 * coalesce(o.n_obs, 0) // total AS BIGINT) AS obs_ppm,
       |       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
       |       CAST(1000000 * coalesce(o.n_obs, 0) // total - e.exp_ppm AS BIGINT) AS dev_ppm
       |FROM e LEFT JOIN o USING (digit) CROSS JOIN t
       |ORDER BY e.digit""".stripMargin
  }

  // --- right-to-be-forgotten cascade audit ---
  // The planning read a lakehouse runs BEFORE a GDPR erasure merge: for
  // a deletion list of subjects, how many rows each downstream table
  // must rewrite, following the FK chain customer -> orders -> lineitem.
  // Every hop is a semi-join against the (broadcast) deletion list or
  // the previous hop's keys — the cascade never materializes row data,
  // only keys and counts — and the per-table share is integer ppm. At
  // scale this is exactly the file-pruning input: tables rewrite only
  // the files these counts touch.
  def qDeleteCascade(spark: SparkSession, dir: String): DataFrame = {
    val forget = customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val ords = orders(spark, dir)
      .join(broadcast(forget), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    val li = lineitem(spark, dir)
      .join(ords.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"))
    def row(name: String, hit: DataFrame, keyCol: String, total: DataFrame) =
      hit.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(keyCol)).as("n_keys"))
        .crossJoin(broadcast(total.agg(count(lit(1)).as("t"))))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_keys"),
          expr("1000000 * n_rows div t").as("share_ppm"))
    row("customer", forget, "c_custkey", customer(spark, dir))
      .unionByName(row("orders", ords, "o_orderkey", orders(spark, dir)))
      .unionByName(row("lineitem", li, "l_orderkey", lineitem(spark, dir)))
      .orderBy(col("table_name"))
  }

  val qDeleteCascadeOracle: String =
    """WITH f AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |o AS (SELECT o_orderkey FROM orders JOIN f ON o_custkey = c_custkey),
      |l AS (SELECT l_orderkey FROM lineitem JOIN o ON l_orderkey = o_orderkey),
      |rows AS (
      |  SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys,
      |         (SELECT count(*) FROM customer) AS t
      |  FROM f
      |  UNION ALL
      |  SELECT 'orders', CAST(count(*) AS BIGINT),
      |         CAST(count(DISTINCT o_orderkey) AS BIGINT),
      |         (SELECT count(*) FROM orders)
      |  FROM o
      |  UNION ALL
      |  SELECT 'lineitem', CAST(count(*) AS BIGINT),
      |         CAST(count(DISTINCT l_orderkey) AS BIGINT),
      |         (SELECT count(*) FROM lineitem)
      |  FROM l)
      |SELECT table_name, n_rows, n_keys,
      |       CAST(1000000 * n_rows // t AS BIGINT) AS share_ppm
      |FROM rows ORDER BY table_name""".stripMargin

  // --- column-correlation statistics (CBO input) ---
  // The ANALYZE pass a cost-based optimizer wants before trusting
  // multi-predicate selectivity estimates: pairwise Pearson r over
  // lineitem's numeric columns. Never `corr()` (engine-internal
  // accumulation order); instead ONE map-side-combinable aggregation
  // collects BIGINT sufficient statistics over integer-unit projections
  // (whole quantities, whole dollars, discount basis points — rounded
  // per row, so every sum is order-free), and the closed form touches
  // doubles exactly once per pair, rounded to 6. The q_autocorr recipe
  // applied to the optimizer-stats surface.
  def qColumnCorr(spark: SparkSession, dir: String): DataFrame = {
    val u = lineitem(spark, dir).select(
      expr("CAST(round(l_quantity) AS BIGINT)").as("q"),
      expr("CAST(round(l_extendedprice) AS BIGINT)").as("p"),
      expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"))
    val s = u.agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"), sum(col("d")).as("sd"),
      sum(col("q") * col("q")).as("sqq"),
      sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"),
      sum(col("q") * col("p")).as("sqp"),
      sum(col("q") * col("d")).as("sqd"),
      sum(col("p") * col("d")).as("spd"))
    def corr(name: String, sxy: String, sx: String, sy: String,
        sxx: String, syy: String) =
      s.select(lit(name).as("pair"), col("n"),
        round(expr(
          s"""(CAST(n AS DOUBLE) * $sxy - CAST($sx AS DOUBLE) * $sy) /
             |sqrt((CAST(n AS DOUBLE) * $sxx - CAST($sx AS DOUBLE) * $sx) *
             |     (CAST(n AS DOUBLE) * $syy - CAST($sy AS DOUBLE) * $sy))""".stripMargin),
          6).as("pearson_r"))
    corr("quantity~price", "sqp", "sq", "sp", "sqq", "spp")
      .unionByName(corr("quantity~discount", "sqd", "sq", "sd", "sqq", "sdd"))
      .unionByName(corr("price~discount", "spd", "sp", "sd", "spp", "sdd"))
      .orderBy(col("pair"))
  }

  val qColumnCorrOracle: String =
    """WITH u AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
      |         CAST(round(l_extendedprice) AS BIGINT) AS p,
      |         CAST(round(l_discount * 100) AS BIGINT) AS d
      |  FROM lineitem),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
      |         CAST(sum(d) AS BIGINT) AS sd,
      |         CAST(sum(q * q) AS BIGINT) AS sqq,
      |         CAST(sum(p * p) AS BIGINT) AS spp,
      |         CAST(sum(d * d) AS BIGINT) AS sdd,
      |         CAST(sum(q * p) AS BIGINT) AS sqp,
      |         CAST(sum(q * d) AS BIGINT) AS sqd,
      |         CAST(sum(p * d) AS BIGINT) AS spd
      |  FROM u)
      |SELECT 'price~discount' AS pair, n,
      |       round((CAST(n AS DOUBLE) * spd - CAST(sp AS DOUBLE) * sd) /
      |             sqrt((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp) *
      |                  (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)), 6) AS pearson_r
      |FROM s
      |UNION ALL
      |SELECT 'quantity~discount', n,
      |       round((CAST(n AS DOUBLE) * sqd - CAST(sq AS DOUBLE) * sd) /
      |             sqrt((CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq) *
      |                  (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)), 6)
      |FROM s
      |UNION ALL
      |SELECT 'quantity~price', n,
      |       round((CAST(n AS DOUBLE) * sqp - CAST(sq AS DOUBLE) * sp) /
      |             sqrt((CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq) *
      |                  (CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)), 6)
      |FROM s
      |ORDER BY pair""".stripMargin

  // --- data-quality assertion suite ---
  // The data-contract gate an ingest runs before publishing (the
  // Great-Expectations shape): each rule is one counting predicate,
  // the report is (rule, n_violations, pass). Rules cover the contract
  // classes that matter — nullability, uniqueness, referential
  // integrity, value ranges, and freshness — and every rule is a
  // map-side-combinable count or an anti-join, unioned at metadata
  // scale. A deployment keys alerting off `pass`.
  def qDqChecks(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val o = orders(spark, dir)
    def rule(name: String, viol: DataFrame) =
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"),
          (col("n_violations") === 0L).as("pass"))
    rule("events.user_id not null", e.filter(col("user_id").isNull))
      .unionByName(rule("events.event_id unique",
        e.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)))
      .unionByName(rule("events.value in [0, 10000)",
        e.filter(col("value") < 0 || col("value") >= 10000)))
      .unionByName(rule("events.event_type in vocabulary",
        e.filter(!col("event_type").isin("view", "click", "purchase",
          "signup", "error"))))
      .unionByName(rule("orders.o_custkey references customer",
        o.join(customer(spark, dir).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")))
      .unionByName(rule("events fresh within 370 days of max",
        e.crossJoin(broadcast(e.agg(max(col("ts")).as("mx"))))
          .filter(expr("ts < mx - INTERVAL 370 DAYS"))))
      .orderBy(col("rule"))
  }

  val qDqChecksOracle: String =
    """SELECT 'events.event_id unique' AS rule,
      |       CAST((SELECT count(*) FROM (
      |         SELECT event_id FROM events GROUP BY 1 HAVING count(*) > 1)) AS BIGINT) AS n_violations,
      |       (SELECT count(*) FROM (
      |         SELECT event_id FROM events GROUP BY 1 HAVING count(*) > 1)) = 0 AS pass
      |UNION ALL
      |SELECT 'events.event_type in vocabulary',
      |       CAST((SELECT count(*) FROM events WHERE event_type NOT IN
      |         ('view','click','purchase','signup','error')) AS BIGINT),
      |       (SELECT count(*) FROM events WHERE event_type NOT IN
      |         ('view','click','purchase','signup','error')) = 0
      |UNION ALL
      |SELECT 'events.user_id not null',
      |       CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT),
      |       (SELECT count(*) FROM events WHERE user_id IS NULL) = 0
      |UNION ALL
      |SELECT 'events.value in [0, 10000)',
      |       CAST((SELECT count(*) FROM events WHERE value < 0 OR value >= 10000) AS BIGINT),
      |       (SELECT count(*) FROM events WHERE value < 0 OR value >= 10000) = 0
      |UNION ALL
      |SELECT 'events fresh within 370 days of max',
      |       CAST((SELECT count(*) FROM events
      |         WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 370 DAYS) AS BIGINT),
      |       (SELECT count(*) FROM events
      |         WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 370 DAYS) = 0
      |UNION ALL
      |SELECT 'orders.o_custkey references customer',
      |       CAST((SELECT count(*) FROM orders
      |         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
      |       (SELECT count(*) FROM orders
      |         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
      |ORDER BY rule""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> (qDqChecks _),
    "q_column_corr" -> (qColumnCorr _),
    "q_delete_cascade" -> (qDeleteCascade _),
    "q_benford" -> (qBenford _),
    "q_gap_fill" -> (qGapFill _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_cdc_apply" -> (qCdcApply _),
    "q_ref_integrity" -> (qRefIntegrity _),
    "q_profile" -> (qProfile _),
    "q_clustering_depth" -> (qClusteringDepth _),
    "q_histogram_stats" -> (qHistogramStats _),
    "q_join_estimate" -> (qJoinEstimate _),
    "q_time_travel" -> (qTimeTravel _),
    "q_scd2_apply" -> (qScd2Apply _),
    "q_pruning_stats" -> (qPruningStats _))

  /** name -> DuckDB oracle SQL, for the driver gate. */
  def oracles: Map[String, String] = Map(
    "q_benford" -> qBenfordOracle,
    "q_delete_cascade" -> qDeleteCascadeOracle,
    "q_column_corr" -> qColumnCorrOracle,
    "q_dq_checks" -> qDqChecksOracle,
    "q_gap_fill" -> qGapFillOracle,
    "q_snapshot_diff" -> qSnapshotDiffOracle,
    "q_compaction_plan" -> qCompactionPlanOracle,
    "q_heavy_hitters" -> qHeavyHittersOracle,
    "q_cdc_apply" -> qCdcApplyOracle,
    "q_ref_integrity" -> qRefIntegrityOracle,
    "q_profile" -> qProfileOracle,
    "q_clustering_depth" -> qClusteringDepthOracle,
    "q_histogram_stats" -> qHistogramStatsOracle,
    "q_join_estimate" -> qJoinEstimateOracle,
    "q_time_travel" -> qTimeTravelOracle,
    "q_scd2_apply" -> qScd2ApplyOracle,
    "q_pruning_stats" -> qPruningStatsOracle)
}
