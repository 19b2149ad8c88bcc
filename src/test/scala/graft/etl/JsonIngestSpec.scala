package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The declarative from_json ingest path over raw API response bodies
  * (SURVEY.md §1.4), end-to-end into canonical rows.
  */
class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  test("ArcGIS response payloads parse to attribute rows then canonical violations") {
    val payload =
      """{"features":[
        |  {"attributes":{"OBJECTID":1,"ISSUE_DATE":1730463300000,
        |    "ISSUING_AGENCY_NAME":"MPD","FINE_AMOUNT":"100","LATITUDE":38.9}},
        |  {"attributes":{"OBJECTID":2,"ISSUE_DATE":null,"FINE_AMOUNT":"NaN"}}
        |]}""".stripMargin.replaceAll("\n", "")
    val raw = Seq(payload).toDF("payload")
    val attrs = Transforms.parseArcGisResponses(raw)
    assert(attrs.count() == 2)
    assert(attrs.schema.fieldNames.contains("VIOLATION_PROCESS_DESC")) // full schema
    val canonical = Transforms.violationsFromArcGis(attrs,
      useSyntheticId = true, monthOfRecord = Some("2024-11"))
      .orderBy("violation_id").collect()
    assert(canonical.length == 2)
    assert(canonical(0).getString(0) == "2024-11_1")
    assert(canonical(0).getDouble(8) == 100.0)
    assert(canonical(1).isNullAt(1) && canonical(1).isNullAt(8)) // null ms, NaN fine
  }

  test("VisualCrossing payloads parse to day rows then canonical weather") {
    val payload =
      """{"days":[
        |  {"datetime":"2024-11-01","tempmax":62.1,"precip":0.0,
        |   "conditions":"Rain showers"},
        |  {"datetime":"2024-11-02","tempmax":60.0,"precip":0.4,"conditions":"Clear"}
        |]}""".stripMargin.replaceAll("\n", "")
    val days = Transforms.parseVcResponses(Seq(payload).toDF("payload"))
    assert(days.count() == 2)
    val weather = Transforms.weatherFromVc(days, dailySemantics = true)
      .orderBy("weather_date").collect()
    assert(weather(0).getAs[Int]("is_rain") == 1) // conditions variant
    assert(weather(1).getAs[Int]("is_rain") == 1) // precip variant
    assert(weather(0).getDate(0).toString == "2024-11-01")
  }

  test("typed Qa equals the DataFrame Qa on non-null agencies") {
    val v = Seq(
      Model.Violation("a", None, None, Some("MPD"), None, None, None, None,
        None, None, None, None, "2024-09"),
      Model.Violation("b", None, None, Some("MPD"), None, None, None, None,
        None, None, None, None, "2024-09"),
      Model.Violation("c", None, None, Some("DDOT"), None, None, None, None,
        None, None, None, None, "2024-10")).toDS()
    val typed = RefQueries.qaTyped(v).collect().map(_.toSeq)
    val df = RefQueries.qa(v.toDF()).collect().map(_.toSeq)
    assert(typed.toSeq == df.toSeq)
  }
}
