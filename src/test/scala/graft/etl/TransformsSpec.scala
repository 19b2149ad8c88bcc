package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins each scalar derivation to its reference behavior (SURVEY.md §5.1).
  * Reference lines cited per test.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  // to_float_safe: None/uncastable/NaN -> NULL (violation_etl_daily.py:201-210)
  test("toDoubleSafe coerces like to_float_safe") {
    val got = Seq("100", "100.5", "NaN", "nan", "abc", "", null)
      .toDF("s").select(Transforms.toDoubleSafe(col("s")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 100.0 && got(1) == 100.5)
    assert(got(2) == null && got(3) == null && got(4) == null
      && got(5) == null && got(6) == null)
  }

  test("toDoubleSafe passes numeric columns through") {
    val got = Seq((1.5: java.lang.Double), (Double.NaN: java.lang.Double), null)
      .toDF("d").select(Transforms.toDoubleSafe(col("d")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 1.5 && got(1) == null && got(2) == null)
  }

  // ms_to_datetime: epoch-ms -> UTC datetime; None -> NULL (violation_etl_daily.py:213-224)
  test("msToTimestamp converts epoch millis UTC and keeps nulls") {
    val got = Seq((1L, java.lang.Long.valueOf(1730463300000L)), (2L, null))
      .toDF("id", "ms")
      .select(Transforms.msToTimestamp(col("ms")).as("ts"))
      .orderBy(col("ts").asc_nulls_last).collect()
    assert(got(0).getTimestamp(0).toInstant.toString == "2024-11-01T12:15:00Z")
    assert(got(1).isNullAt(0))
  }

  // month key 'YYYY-MM' (violation_etl_daily.py:61-62)
  test("monthKey formats yyyy-MM") {
    assert(one(Transforms.monthKey(lit(Date.valueOf("2024-09-07")))) == "2024-09")
  }

  // synthetic id "{month}_{OBJECTID}" (violation_etl_daily.py:247-248)
  test("syntheticViolationId concatenates month and object id") {
    assert(one(Transforms.syntheticViolationId(lit("2024-11"), lit(12345L)))
      == "2024-11_12345")
  }

  // the two is_rain variants (SURVEY.md §8.2):
  // history: precip>0 only (weather_etl_history.py:85)
  // daily:   precip>0 OR 'rain' in lower(conditions) (weather_etl_daily.py:158-160)
  test("isRain variants diverge on precip=0 + rainy conditions") {
    val rows = Seq(
      (0.0, "Rain showers"), (0.5, "Clear"), (0.0, "Clear"),
      (0.0, "Light rain"), (0.0, null))
      .toDF("precip", "conditions")
      .select(
        Transforms.isRainHistory(col("precip")).as("hist"),
        Transforms.isRainDaily(col("precip"), col("conditions")).as("daily"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) == ((0, 1))) // the divergence case
    assert(rows(1) == ((1, 1)))
    assert(rows(2) == ((0, 0)))
    assert(rows(3) == ((0, 1)))
    assert(rows(4) == ((0, 0)))
  }

  test("isRain handles null precip as dry") {
    val r = Seq((null: java.lang.Double, "Clear"))
      .toDF("precip", "conditions")
      .select(Transforms.isRainHistory(col("precip")).as("h"),
        Transforms.isRainDaily(col("precip"), col("conditions")).as("d"))
      .collect()(0)
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }

  // transform_row end-to-end (violation_etl_daily.py:227-278; FIXTURES.md §1)
  test("violationsFromArcGis: daily path with edge cases") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(12345L, 1730463300000L, "MPD", "Y", "1300 BLK NY AVE", "T119",
          "SPEED 11-15 MPH OVER THE SPEED LIMIT", "100", "0", 38.9169, -76.9831, "12345-ABC"),
        Row(12346L, null, "MPD", null, null, "T120",
          "FAIL TO STOP", "NaN", "abc", null, null, "12346-ABC"),
        Row(12347L, 1730463300000L, "DDOT", "N", "X", "T121",
          "OTHER", "25.5", "25.5", 38.0, -77.0, ""))),
      Model.arcgisAttributesSchema)

    val daily = Transforms.violationsFromArcGis(raw, useSyntheticId = true)
      .orderBy("violation_id").collect()
    // null ISSUE_DATE -> null dates -> null month key -> synthetic id "_12346"
    // (concat_ws skips nulls) — still non-empty so the row survives, as in
    // the reference where month_key comes from the loop day
    assert(daily.length == 3)
    val r0 = daily.find(_.getString(0) == "2024-11_12345").get
    assert(r0.getTimestamp(1).toInstant.toString == "2024-11-01T12:15:00Z")
    assert(r0.getDate(2).toString == "2024-11-01")
    assert(r0.getDouble(8) == 100.0) // fine_amount coerced from string
    val r1 = daily.find(_.getString(0) == "12346").get // month null -> id "12346"
    assert(r1.isNullAt(1) && r1.isNullAt(2))
    assert(r1.isNullAt(8) && r1.isNullAt(9)) // NaN/garbage -> null

    // full-load path: trusts API violation_id; empty id dropped
    // (violation_etl_history.py:108,124)
    val full = Transforms.violationsFromArcGis(raw, useSyntheticId = false)
      .collect()
    assert(full.length == 2)
    assert(full.map(_.getString(0)).toSet == Set("12345-ABC", "12346-ABC"))
  }

  test("violationsFromArcGis: explicit month-of-record pins month and id") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(7L, 1730463300000L, "MPD", null, null, "T1", "D", "1", "2",
          1.0, 2.0, null))),
      Model.arcgisAttributesSchema)
    val got = Transforms.violationsFromArcGis(raw,
      useSyntheticId = true, monthOfRecord = Some("2024-11")).collect()(0)
    assert(got.getString(0) == "2024-11_7")
    assert(got.getString(12) == "2024-11")
  }

  // weather transform (weather_etl_history.py:70-87, weather_etl_daily.py:118-172)
  test("weatherFromVc maps day rows and applies the selected rain semantics") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("2024-11-01", 62.1, 48.3, 55.0, 0.0, 71.2, 9.8, "Rain showers"),
        Row("2024-11-02", 60.0, 50.0, 55.0, 0.3, 70.0, 9.0, "Clear"))),
      Model.vcDaySchema)
    val hist = Transforms.weatherFromVc(raw, dailySemantics = false)
      .orderBy("weather_date").collect()
    val daily = Transforms.weatherFromVc(raw, dailySemantics = true)
      .orderBy("weather_date").collect()
    assert(hist(0).getDate(0).toString == "2024-11-01")
    assert(hist(0).getInt(8) == 0 && daily(0).getInt(8) == 1) // §8.2 split
    assert(hist(1).getInt(8) == 1 && daily(1).getInt(8) == 1)
  }

  test("missingWeatherRow carries the sentinel") {
    val r = Transforms.missingWeatherRow(Date.valueOf("2024-12-05"))
    assert(r.conditions.contains("missing_from_api") && r.is_rain == 0)
    assert(r.weather_date.toString == "2024-12-05")
  }
}
