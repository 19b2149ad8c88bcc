package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Golden tests for Qa–Qh on a controlled fixture (FIXTURES.md §3
  * coverage), with expectations computed by hand, plus SQL-form ≡
  * DataFrame-form equivalence for every query.
  */
class RefQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
  private def d(s: String) = Date.valueOf(s)

  // violations: 10 rows across 3 months, 2 agencies, varied descs/indicators.
  // columns: violation_id, issue_date, violation_date, agency, accident,
  //          location, code, desc, fine, paid, lat, lon, month
  private lazy val violations: DataFrame = Seq(
    // 2024-09: 2 MPD (one speeding >10), Monday 2024-09-30
    ("24-09_1", ts("2024-09-30T08:15:00Z"), d("2024-09-30"), "MPD", "Y",
      "L1", "T119", "SPEED 11-15 MPH OVER THE SPEED LIMIT", 100.0, 0.0, 38.9, -77.0, "2024-09"),
    ("24-09_2", ts("2024-09-30T09:15:00Z"), d("2024-09-30"), "MPD", null,
      "L2", "T122", "SPEED UP TO TEN MPH OVER THE SPEED LIMIT", 50.0, 50.0, 38.9, -77.0, "2024-09"),
    // 2024-10: 3 rows Tue 2024-10-01 (rainy), 1 row Wed 2024-10-02 (dry)
    ("24-10_1", ts("2024-10-01T08:30:00Z"), d("2024-10-01"), "MPD", "N",
      "L3", "T119", "SPEED 11-15 MPH OVER THE SPEED LIMIT", 100.0, 100.0, 38.9, -77.0, "2024-10"),
    ("24-10_2", ts("2024-10-01T08:45:00Z"), d("2024-10-01"), "DDOT", "Y",
      "L4", "T120", "SPEED 1-10 MPH OVER THE SPEED LIMIT", 25.0, 0.0, 38.9, -77.0, "2024-10"),
    ("24-10_3", ts("2024-10-01T17:00:00Z"), d("2024-10-01"), "MPD", "Y",
      "L5", "T123", "FAIL TO STOP AT RED LIGHT", 150.0, 0.0, 38.9, -77.0, "2024-10"),
    ("24-10_4", ts("2024-10-02T08:10:00Z"), d("2024-10-02"), "DDOT", null,
      "L6", "T119", "SPEED 16-20 MPH OVER THE SPEED LIMIT", 200.0, 0.0, 38.9, -77.0, "2024-10"),
    // 2024-11: 4 rows — Fri 2024-11-01 (rainy), Sat 2024-11-02 (dry),
    // one date with no weather row (join coverage), one null issue_date
    ("24-11_1", ts("2024-11-01T08:00:00Z"), d("2024-11-01"), "MPD", "N",
      "L7", "T119", "SPEED 21-25 MPH OVER THE SPEED LIMIT", 300.0, 0.0, 38.9, -77.0, "2024-11"),
    ("24-11_2", ts("2024-11-02T23:00:00Z"), d("2024-11-02"), "MPD", "Y",
      "L8", "T124", "PARKING VIOLATION", 40.0, 40.0, 38.9, -77.0, "2024-11"),
    ("24-11_3", ts("2024-11-09T10:00:00Z"), d("2024-11-09"), "DDOT", "N",
      "L9", "T119", "SPEED 11-15 MPH OVER THE SPEED LIMIT", 100.0, 0.0, 38.9, -77.0, "2024-11"),
    ("24-11_4", null.asInstanceOf[Timestamp], null.asInstanceOf[Date], "MPD", null,
      "L10", "T125", "OTHER", 10.0, 0.0, 38.9, -77.0, "2024-11"))
    .toDF("violation_id", "issue_date", "violation_date", "issuing_agency_name",
      "accident_indicator", "location", "violation_code", "violation_desc",
      "fine_amount", "total_paid", "latitude", "longitude", "month")

  // weather: covers 2024-09-30..2024-11-02 (not 11-09 — join gap), 2 rainy
  private lazy val weather: DataFrame = Seq(
    (d("2024-09-30"), 70.0, 50.0, 60.0, 0.0, 50.0, 5.0, "Clear", 0),
    (d("2024-10-01"), 65.0, 48.0, 57.0, 0.4, 80.0, 8.0, "Rain", 1),
    (d("2024-10-02"), 66.0, 49.0, 58.0, 0.0, 60.0, 6.0, "Cloudy", 0),
    (d("2024-11-01"), 60.0, 40.0, 50.0, 0.2, 85.0, 9.0, "Light rain", 1),
    (d("2024-11-02"), 58.0, 39.0, 48.0, 0.0, 55.0, 7.0, "Clear", 0))
    .toDF("weather_date", "tempmax", "tempmin", "temp", "precip",
      "humidity", "windspeed", "conditions", "is_rain")

  private lazy val sqlResults = RefQueries.runAllSql(spark, violations, weather)
  private lazy val dfResults = RefQueries.runAllDf(violations, weather)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("Qa: tickets per month x agency, ordered") {
    val expect = Seq(
      Seq("2024-09", "MPD", 2L),
      Seq("2024-10", "DDOT", 2L), Seq("2024-10", "MPD", 2L),
      Seq("2024-11", "DDOT", 1L), Seq("2024-11", "MPD", 3L))
    assert(rows(dfResults("qa")) == expect)
    assert(rows(sqlResults("qa")) == expect)
  }

  test("Qb: count since 2024-10-01 (null dates excluded)") {
    assert(rows(dfResults("qb")) == Seq(Seq(7L)))
    assert(rows(sqlResults("qb")) == Seq(Seq(7L)))
  }

  test("Qc: avg daily tickets per weekday in FIELD order") {
    // per-day counts: Mon 9/30=2, Tue 10/1=3, Wed 10/2=1, Fri 11/1=1,
    // Sat 11/2=1, Sat 11/9=1, null-date row grouped under null weekday.
    // weekday avgs: Monday 2.0, Tuesday 3.0, Wednesday 1.0, Friday 1.0,
    // Saturday (1+1)/2=1.0, plus the null group (FIELD=0 sorts first).
    val got = rows(dfResults("qc"))
    val gotSql = rows(sqlResults("qc"))
    assert(got == gotSql)
    val named = got.filter(_.head != null)
    assert(named == Seq(
      Seq("Monday", 2.0), Seq("Tuesday", 3.0), Seq("Wednesday", 1.0),
      Seq("Friday", 1.0), Seq("Saturday", 1.0)))
  }

  test("Qd: tickets on rainy days") {
    // rainy dates: 10-01 (3 tickets) + 11-01 (1 ticket) = 4
    assert(rows(dfResults("qd")) == Seq(Seq(4L)))
    assert(rows(sqlResults("qd")) == Seq(Seq(4L)))
  }

  test("Qe: monthly precip totals") {
    val expect = Seq(
      Seq("2024-09", 0.0), Seq("2024-10", 0.4), Seq("2024-11", 0.2))
    assert(rows(dfResults("qe")) == expect)
    assert(rows(sqlResults("qe")) == expect)
  }

  test("Qf: >10mph-over fines per month (LIKE / NOT LIKE)") {
    // qualifying: 24-09_1 (100), 24-10_1 (100), 24-10_4 (200),
    // 24-11_1 (300), 24-11_3 (100); excluded: UP TO TEN, 1-10 MPH
    val expect = Seq(
      Seq("2024-09", 100.0), Seq("2024-10", 300.0), Seq("2024-11", 400.0))
    assert(rows(dfResults("qf")) == expect)
    assert(rows(sqlResults("qf")) == expect)
  }

  test("Qg: avg tickets per hour of day") {
    // (day,hour) counts: (9/30,8)=1,(9/30,9)=1,(10/1,8)=2,(10/1,17)=1,
    // (10/2,8)=1,(11/1,8)=1,(11/2,23)=1,(11/9,10)=1
    // hour avgs: 8 -> (1+2+1+1)/4=1.25, 9 -> 1, 10 -> 1, 17 -> 1, 23 -> 1
    val expect = Seq(
      Seq(8, 1.25), Seq(9, 1.0), Seq(10, 1.0), Seq(17, 1.0), Seq(23, 1.0))
    assert(rows(dfResults("qg")) == expect)
    assert(rows(sqlResults("qg")) == expect)
  }

  test("Qh: accident vs non-accident by rain flag") {
    // joined tickets (11-09 has no weather row; null date drops out):
    // dry days (9/30 x2, 10/2 x1, 11/2 x1): Y on 24-09_1 and 24-11_2
    //   -> (is_rain=0: acc=2, non=2)
    // rainy days (10/1 x3, 11/1 x1): Y on 24-10_2 and 24-10_3
    //   -> (is_rain=1: acc=2, non=2)
    val expect = Seq(Seq(0, 2L, 2L), Seq(1, 2L, 2L))
    assert(rows(dfResults("qh")) == expect)
    assert(rows(sqlResults("qh")) == expect)
  }

  test("weather side of Qd/Qh is broadcast (bounded dimension)") {
    val plan = dfResults("qd").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("the reference's original analysis_queries.sql text runs end-to-end") {
    // Read the file as published and execute every statement verbatim —
    // FIELD / DAYNAME / %-pattern DATE_FORMAT all through the
    // FieldExpr.register shadows. No translation, no copying: the text
    // comes straight from the reference at test time.
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/sql/analysis_queries.sql")),
      java.nio.charset.StandardCharsets.UTF_8)
    val stmts = text.split(";").map(_.trim).filter { s =>
      val noComments = s.linesIterator
        .filterNot(_.trim.startsWith("--")).mkString("\n").trim
      noComments.nonEmpty && !noComments.toUpperCase.startsWith("USE ")
    }
    assert(stmts.length == 8) // Qa..Qh in file order
    graft.functions.FieldExpr.register(spark)
    violations.createOrReplaceTempView("violations")
    weather.createOrReplaceTempView("weather_daily")
    val originals = stmts.map(s => rows(spark.sql(s)))

    // Values must agree with the DataFrame builders. Normalization: the
    // original Qg groups the null issue_date under a null hour (our
    // builder filters it) — drop null-first-column rows on both sides;
    // Qb/Qh carry no ORDER BY in the file, so compare as sets.
    val dfs = Seq("qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh").map(dfResults)
    originals.zip(dfs.map(rows)).zipWithIndex.foreach { case ((orig, df), i) =>
      val o = orig.filter(_.head != null)
      val d = df.filter(_.head != null)
      assert(o.toSet == d.toSet, s"statement ${i + 1} diverged")
      assert(o.size == d.size, s"statement ${i + 1} row count diverged")
    }
  }
}
