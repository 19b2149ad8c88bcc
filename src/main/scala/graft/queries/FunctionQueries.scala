package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** The reference's scalar-function surface (SURVEY.md §2.8, C1–C17)
  * demonstrated over the events table — every derivation the reference's
  * Python transforms perform, as codegen'd Column expressions (no UDFs).
  */
object FunctionQueries {

  // --- C1/C2/C4/C5/C6/C7/C8: datetime + rounding functions ---
  // ref: etl/daily_load/violation_etl_daily.py:213-224 (ms->datetime),
  //      :245 (date part), :61-62 (month key); sql/analysis_queries.sql:27,47,74.
  def qScalarDatetime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_id") % 100 === 0)
      .select(
        col("event_id"),
        unix_millis(col("ts")).as("epoch_ms"),                     // inverse of C1
        timestamp_millis(unix_millis(col("ts"))).as("ts_from_ms"), // C1
        // dates rendered as ISO strings: bare DATE columns round-trip
        // differently through pyarrow vs duckdb in the compare harness
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("event_date"), // C2
        date_format(col("ts"), "EEEE").as("weekday_name"),         // C3
        hour(col("ts")).as("hour_of_day"),                         // C4
        date_format(col("ts"), "yyyy-MM").as("month_key"),         // C5/C6
        date_format(date_add(to_date(col("ts")), 1), "yyyy-MM-dd").as("next_day"), // C7
        round(col("value"), 2).as("value_rounded"))                // C8
      .orderBy(col("event_id"))

  val qScalarDatetimeOracle: String =
    """SELECT event_id,
      |       epoch_ms(ts) AS epoch_ms,
      |       epoch_ms(epoch_ms(ts)) AS ts_from_ms,
      |       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
      |       dayname(ts) AS weekday_name,
      |       CAST(hour(ts) AS INT) AS hour_of_day,
      |       strftime(ts, '%Y-%m') AS month_key,
      |       strftime(CAST(ts AS DATE) + 1, '%Y-%m-%d') AS next_day,
      |       round(value, 2) AS value_rounded
      |FROM events WHERE event_id % 100 = 0 ORDER BY 1""".stripMargin

  // --- C9/C10/C11/C12/C13/C14/C16/C17: string + coercion functions ---
  // ref: etl/daily_load/violation_etl_daily.py:201-210 (to_float_safe),
  //      :247-248 (synthetic key), weather_etl_daily.py:156-160 (is_rain).
  def qScalarString(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_id") % 100 === 1)
      .select(
        col("event_id"),
        // C9: NaN/garbage-safe numeric coercion (ANSI-safe via try_cast)
        expr("try_cast(regexp_extract(props, '[0-9]+', 0) AS DOUBLE)").as("prop_k"),
        expr("try_cast('not a number' AS DOUBLE)").as("bad_num"),
        // C10: synthetic key "{month}_{id}"
        concat_ws("_", date_format(col("ts"), "yyyy-MM"), col("event_id")).as("synthetic_id"),
        // C11: numeric id -> string
        col("event_id").cast(StringType).as("id_str"),
        // C12/C13/C14: lower+contains -> 0/1 flag via CASE WHEN
        when(lower(col("event_type")).contains("click"), 1).otherwise(0).as("is_click"),
        // C16: LIKE
        col("event_type").like("s%").as("starts_with_s"),
        // C17: null/empty-string default
        coalesce(nullif(col("event_type"), lit("")), lit("unknown")).as("type_or_unknown"))
      .orderBy(col("event_id"))

  val qScalarStringOracle: String =
    """SELECT event_id,
      |       try_cast(regexp_extract(props, '[0-9]+') AS DOUBLE) AS prop_k,
      |       try_cast('not a number' AS DOUBLE) AS bad_num,
      |       concat_ws('_', strftime(ts, '%Y-%m'), event_id) AS synthetic_id,
      |       CAST(event_id AS VARCHAR) AS id_str,
      |       CASE WHEN contains(lower(event_type), 'click') THEN 1 ELSE 0 END AS is_click,
      |       event_type LIKE 's%' AS starts_with_s,
      |       coalesce(nullif(event_type, ''), 'unknown') AS type_or_unknown
      |FROM events WHERE event_id % 100 = 1 ORDER BY 1""".stripMargin

  // --- semi-structured columns: JSON extraction without a UDF ---
  // Real event streams carry a JSON props blob; the engine must reach
  // into it relationally. Both extraction forms are exercised — schema-
  // on-read `from_json` (typed struct, the 100 TB path: one parse per
  // row, pushes through codegen) and path-based `get_json_object` — and
  // proven equal in-row before aggregating per extracted key bucket.
  // DECIMAL-routed value sums keep the aggregate order-insensitive.
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", from_json(col("props"), StructType(
        Seq(StructField("k", IntegerType)))).getField("k"))
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("int"))
      // both extraction forms must agree row-by-row; a mismatch poisons
      // the aggregate rather than silently picking one form
      .withColumn("k", when(col("k") === col("k_path"), col("k")))
      .groupBy((col("k") % 10).cast("int").as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(round(col("value"), 2).cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy(col("k_bucket"))

  val qJsonExtractOracle: String =
    """SELECT CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS INT) AS k_bucket,
      |       count(*) AS n_events,
      |       round(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE), 2)
      |         AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // --- pivot: long-to-wide reshaping ---
  // The reporting reshape (per-source doc counts fanned across language
  // columns). Spark's pivot with an EXPLICIT value list compiles to one
  // hash aggregate of conditional counts — no extra shuffle vs the
  // groupBy, and the explicit list is the 100 TB form (an unlisted pivot
  // first runs a distinct scan to discover values). The oracle states
  // the same computation as conditional sums.
  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  def qPivotLang(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L, PivotLangs)
      .select(col("source") +: PivotLangs.map(l => col(l).as(s"n_$l")): _*)
      .orderBy(col("source"))

  val qPivotLangOracle: String = {
    val cols = PivotLangs.map(l =>
      s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l")
      .mkString(",\n      |       ")
    s"""SELECT source,
      |       $cols
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  // --- CUBE: all grouping-set combinations in one pass ---
  // Complements the existing ROLLUP query: CUBE(event_type, weekday)
  // emits every subset's aggregate with one shuffle (Catalyst expands
  // the grouping sets map-side). grouping() flags disambiguate real
  // NULLs from super-aggregate rows — the portable way to read cubes.
  def qCubeTypeDay(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("weekday", date_format(col("ts"), "EEEE"))
      .cube(col("event_type"), col("weekday"))
      .agg(
        grouping(col("event_type")).cast("int").as("g_type"),
        grouping(col("weekday")).cast("int").as("g_day"),
        count(lit(1)).as("n_events"))
      .orderBy(col("g_type"), col("g_day"), col("event_type"), col("weekday"))

  val qCubeTypeDayOracle: String =
    """SELECT event_type,
      |       dayname(ts) AS weekday,
      |       CAST(GROUPING(event_type) AS INT) AS g_type,
      |       CAST(GROUPING(dayname(ts)) AS INT) AS g_day,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY CUBE(event_type, dayname(ts))
      |ORDER BY g_type, g_day, event_type, weekday""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_datetime" -> (qScalarDatetime _),
    "q_scalar_string" -> (qScalarString _),
    "q_json_extract" -> (qJsonExtract _),
    "q_pivot_lang" -> (qPivotLang _),
    "q_cube_type_day" -> (qCubeTypeDay _))

  def oracles: Map[String, String] = Map(
    "q_scalar_datetime" -> qScalarDatetimeOracle,
    "q_scalar_string" -> qScalarStringOracle,
    "q_json_extract" -> qJsonExtractOracle,
    "q_pivot_lang" -> qPivotLangOracle,
    "q_cube_type_day" -> qCubeTypeDayOracle)
}
