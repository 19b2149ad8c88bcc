package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FieldExpr.field

/** The reference's eight analytical queries Qa–Qh
  * (ref: sql/analysis_queries.sql:5-91) over the canonical violations /
  * weather_daily tables, in both forms:
  *
  *  - `sql`: the query text, translated MySQL→Spark SQL. With
  *    [[graft.functions.FieldExpr.register]] applied, Qc runs with the
  *    original `FIELD(...)`/`DAYNAME(...)` calls unchanged.
  *  - DataFrame builders: the same plans as typed, composable API calls.
  *
  * Scale notes: weather_daily is bounded (one row/day — ≤ ~490 rows,
  * SURVEY.md §6) so every violations⋈weather join broadcasts the weather
  * side; all aggregations are partial/final hash aggregates; Qb/Qd/Qh
  * predicates push to the violations scan (partition-prunable on `month`).
  */
object RefQueries {

  private val weekdays =
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")

  /** Qa in the typed Dataset API: compile-time field checks via the
    * Violation case class; identical results to [[qa]] including the NULL
    * agency group (the Option stays in the key — no default folding).
    */
  def qaTyped(violations: org.apache.spark.sql.Dataset[Model.Violation])
      : DataFrame = {
    val spark = violations.sparkSession
    import spark.implicits._
    violations
      .groupByKey(v => (v.month, v.issuing_agency_name))
      .count()
      .toDF("key", "tickets_count")
      .select(col("key._1").as("month"), col("key._2").as("issuing_agency_name"),
        col("tickets_count"))
      .orderBy(col("month"), col("issuing_agency_name"))
  }

  /** Qa: tickets per (month, agency). ref: sql/analysis_queries.sql:6-12. */
  def qa(violations: DataFrame): DataFrame =
    violations
      .groupBy(col("month"), col("issuing_agency_name"))
      .agg(count(lit(1)).as("tickets_count"))
      .orderBy(col("month"), col("issuing_agency_name"))

  val qaSql: String =
    """SELECT month, issuing_agency_name, COUNT(*) AS tickets_count
      |FROM violations
      |GROUP BY month, issuing_agency_name
      |ORDER BY month, issuing_agency_name""".stripMargin

  /** Qb: tickets since 2024-10-01. ref: sql/analysis_queries.sql:15-18. */
  def qb(violations: DataFrame): DataFrame =
    violations
      .filter(col("violation_date") >= lit(java.sql.Date.valueOf("2024-10-01")))
      .agg(count(lit(1)).as("tickets_since_oct1"))

  val qbSql: String =
    """SELECT COUNT(*) AS tickets_since_oct1
      |FROM violations
      |WHERE violation_date >= DATE '2024-10-01'""".stripMargin

  /** Qc: average daily tickets per weekday, weekday-ordered.
    * ref: sql/analysis_queries.sql:21-35 (DAYNAME + ORDER BY FIELD).
    */
  def qc(violations: DataFrame): DataFrame = {
    val daily = violations
      .groupBy(col("violation_date"))
      .agg(count(lit(1)).as("daily_tickets"))
    daily
      .groupBy(date_format(col("violation_date"), "EEEE").as("weekday"))
      .agg(avg(col("daily_tickets")).as("avg_daily_tickets"))
      .orderBy(field(col("weekday"), weekdays: _*))
  }

  /** Qc with the original MySQL surface (needs FieldExpr.register). */
  val qcSql: String =
    """SELECT weekday, AVG(daily_tickets) AS avg_daily_tickets
      |FROM (
      |  SELECT violation_date, dayname(violation_date) AS weekday,
      |         COUNT(*) AS daily_tickets
      |  FROM violations
      |  GROUP BY violation_date
      |) AS per_day
      |GROUP BY weekday
      |ORDER BY FIELD(weekday, 'Monday','Tuesday','Wednesday','Thursday',
      |               'Friday','Saturday','Sunday')""".stripMargin

  /** Qd: tickets issued on rainy days (flagship join).
    * ref: sql/analysis_queries.sql:38-43; README.md:45-51.
    */
  def qd(violations: DataFrame, weather: DataFrame): DataFrame =
    violations
      .join(broadcast(weather),
        col("violation_date") === col("weather_date"), "inner")
      .filter(col("is_rain") === 1)
      .agg(count(lit(1)).as("tickets_on_rainy_days"))

  val qdSql: String =
    """SELECT COUNT(*) AS tickets_on_rainy_days
      |FROM violations v
      |JOIN weather_daily w ON v.violation_date = w.weather_date
      |WHERE w.is_rain = 1""".stripMargin

  /** Qe: monthly precipitation totals. ref: sql/analysis_queries.sql:46-51. */
  def qe(weather: DataFrame): DataFrame =
    weather
      .groupBy(date_format(col("weather_date"), "yyyy-MM").as("year_month"))
      .agg(round(sum(col("precip")), 2).as("total_precip"))
      .orderBy(col("year_month"))

  /** Qe with the original MySQL surface — `DATE_FORMAT('%Y-%m')` runs
    * as-is via the [[graft.functions.FieldExpr.register]] hybrid shadow
    * (ref: sql/analysis_queries.sql:45-51, text parity like Qc's FIELD).
    */
  val qeSql: String =
    """SELECT DATE_FORMAT(weather_date, '%Y-%m') AS year_month_,
      |       ROUND(SUM(precip),2) AS total_precipitation
      |FROM weather_daily
      |GROUP BY year_month_
      |ORDER BY year_month_""".stripMargin

  /** Qf: monthly fines for >10-mph-over speeding.
    * ref: sql/analysis_queries.sql:55-63.
    */
  def qf(violations: DataFrame): DataFrame =
    violations
      .filter(col("violation_desc").like("%MPH OVER%")
        && !col("violation_desc").like("%UP TO TEN MPH OVER%")
        && !col("violation_desc").like("%1-10 MPH OVER%"))
      .groupBy(col("month"))
      .agg(sum(col("fine_amount")).as("total_fines"))
      .orderBy(col("month"))

  val qfSql: String =
    """SELECT month, SUM(fine_amount) AS total_fines
      |FROM violations
      |WHERE violation_desc LIKE '%MPH OVER%'
      |  AND violation_desc NOT LIKE '%UP TO TEN MPH OVER%'
      |  AND violation_desc NOT LIKE '%1-10 MPH OVER%'
      |GROUP BY month
      |ORDER BY month""".stripMargin

  /** Qg: average tickets per hour of day. ref: sql/analysis_queries.sql:68-80. */
  def qg(violations: DataFrame): DataFrame = {
    val perDayHour = violations
      .filter(col("issue_date").isNotNull)
      .groupBy(to_date(col("issue_date")).as("d"), hour(col("issue_date")).as("hr"))
      .agg(count(lit(1)).as("tickets"))
    perDayHour
      .groupBy(col("hr"))
      .agg(avg(col("tickets")).as("avg_tickets_per_hour"))
      .orderBy(col("hr"))
  }

  val qgSql: String =
    """SELECT hr, AVG(tickets) AS avg_tickets_per_hour
      |FROM (
      |  SELECT DATE(issue_date) AS d, HOUR(issue_date) AS hr, COUNT(*) AS tickets
      |  FROM violations
      |  WHERE issue_date IS NOT NULL
      |  GROUP BY DATE(issue_date), HOUR(issue_date)
      |) AS per_hour
      |GROUP BY hr
      |ORDER BY hr""".stripMargin

  /** Qh: accident vs non-accident tickets by rain flag.
    * ref: sql/analysis_queries.sql:83-91.
    */
  def qh(violations: DataFrame, weather: DataFrame): DataFrame =
    violations
      .join(broadcast(weather),
        col("violation_date") === col("weather_date"), "inner")
      .groupBy(col("is_rain"))
      .agg(
        sum(when(col("accident_indicator") === "Y", 1).otherwise(0))
          .as("accident_tickets"),
        sum(when(col("accident_indicator").isNull
          || col("accident_indicator") =!= "Y", 1).otherwise(0))
          .as("non_accident_tickets"))
      .orderBy(col("is_rain"))

  val qhSql: String =
    """SELECT w.is_rain,
      |       SUM(CASE WHEN v.accident_indicator = 'Y' THEN 1 ELSE 0 END)
      |         AS accident_tickets,
      |       SUM(CASE WHEN v.accident_indicator IS NULL
      |                  OR v.accident_indicator <> 'Y' THEN 1 ELSE 0 END)
      |         AS non_accident_tickets
      |FROM violations v
      |JOIN weather_daily w ON v.violation_date = w.weather_date
      |GROUP BY w.is_rain
      |ORDER BY w.is_rain""".stripMargin

  /** Registers both tables as temp views and returns all eight SQL-form
    * results by name (the `spark.sql` surface of the engine).
    */
  def runAllSql(
      spark: SparkSession,
      violations: DataFrame,
      weather: DataFrame): Map[String, DataFrame] = {
    graft.functions.FieldExpr.register(spark)
    violations.createOrReplaceTempView("violations")
    weather.createOrReplaceTempView("weather_daily")
    Map(
      "qa" -> qaSql, "qb" -> qbSql, "qc" -> qcSql, "qd" -> qdSql,
      "qe" -> qeSql, "qf" -> qfSql, "qg" -> qgSql, "qh" -> qhSql)
      .map { case (k, s) => k -> spark.sql(s) }
  }

  /** The same eight queries via the DataFrame builders. */
  def runAllDf(violations: DataFrame, weather: DataFrame): Map[String, DataFrame] =
    Map(
      "qa" -> qa(violations), "qb" -> qb(violations), "qc" -> qc(violations),
      "qd" -> qd(violations, weather), "qe" -> qe(weather),
      "qf" -> qf(violations), "qg" -> qg(violations),
      "qh" -> qh(violations, weather))
}
