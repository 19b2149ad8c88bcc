package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.Tables

/** End-to-end drive of the reference pipeline on in-memory fixture
  * payloads: raw ArcGIS/VisualCrossing rows → transforms → idempotent
  * sinks → watermark incremental → Qa–Qh (both SQL and DataFrame forms).
  *
  * Usage: sbt "runMain graft.etl.PipelineDemo /tmp/graft-demo"
  */
object PipelineDemo {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft-demo")
    val spark = Tables.localSession(cores = 4)
    import spark.implicits._

    val vPath = s"$base/violations"
    val wPath = s"$base/weather_daily"

    // --- day 1 + 2 of raw ArcGIS payload rows (FIXTURES.md §1) ---
    def rawViolations(day: String, ids: Seq[Long]): DataFrame = {
      val ms = java.time.Instant.parse(s"${day}T12:00:00Z").toEpochMilli
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(i =>
          Row(i, ms + i, "METROPOLITAN POLICE DEPARTMENT",
            if (i % 3 == 0) "Y" else null,
            s"BLOCK $i", "T119", "SPEED 11-15 MPH OVER THE SPEED LIMIT",
            (100.0 + i).toString, "0", 38.9, -77.0, s"api-$i"))),
        Model.arcgisAttributesSchema)
    }
    def rawWeather(day: String, precip: Double, cond: String): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(day, 60.0, 45.0, 52.0, precip, 70.0, 8.0, cond))),
        Model.vcDaySchema)

    // --- incremental run with the watermark loop (cold start) ---
    val report = Incremental.run(spark, vPath, "violation_date",
      coldStart = LocalDate.parse("2024-11-01"),
      today = LocalDate.parse("2024-11-04"),
      fetchDay = d => Transforms.violationsFromArcGis(
        rawViolations(d.toString,
          (d.getDayOfMonth * 100L) to (d.getDayOfMonth * 100L + 4L)),
        useSyntheticId = true,
        monthOfRecord = Some(d.toString.substring(0, 7))),
      sink = (df, _) => Sinks.insertIgnore(spark, df, vPath,
        Seq("violation_id"), partitionBy = Seq("month")))
    println(s"[demo] incremental violations: loaded=${report.loaded} failed=${report.failed}")

    // weather: upsert path (last-writer-wins)
    Seq(("2024-11-01", 0.4, "Rain"), ("2024-11-02", 0.0, "Clear"),
      ("2024-11-03", 0.0, "Rain showers")).foreach { case (d, p, c) =>
      Sinks.upsert(spark,
        Transforms.weatherFromVc(rawWeather(d, p, c), dailySemantics = true),
        wPath, Seq("weather_date"))
    }

    // re-run the same weather day: idempotent upsert
    Sinks.upsert(spark,
      Transforms.weatherFromVc(rawWeather("2024-11-03", 0.0, "Rain showers"),
        dailySemantics = true),
      wPath, Seq("weather_date"))

    // compact the per-day appended files (one file/day/partition otherwise)
    val filesBefore = new java.io.File(vPath, "month=2024-11")
      .listFiles().count(_.getName.endsWith(".parquet"))
    Sinks.compact(spark, vPath, partitioned = true, maxFiles = 1)
    val filesAfter = new java.io.File(vPath, "month=2024-11")
      .listFiles().count(_.getName.endsWith(".parquet"))
    println(s"[demo] compaction: month=2024-11 files $filesBefore -> $filesAfter")

    val violations = spark.read.parquet(vPath)
    val weather = spark.read.parquet(wPath)
    println(s"[demo] lake: violations=${violations.count()} weather=${weather.count()}")

    // --- DSv2 fixture sources: the production read path, driven here ---
    val fxDir = java.nio.file.Files.createTempDirectory("demo-fx")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val feats = root.putArray("features")
    (1L to 4200L).foreach { i =>
      val a = mapper.createObjectNode()
      a.put("OBJECTID", i)
      a.put("ISSUE_DATE", 1730463300000L + i * 1000)
      a.put("ISSUING_AGENCY_NAME", "MPD")
      a.put("FINE_AMOUNT", "75")
      feats.add(mapper.createObjectNode().set[com.fasterxml.jackson.databind.node.ObjectNode]("attributes", a))
    }
    java.nio.file.Files.write(fxDir.resolve("features.json"),
      mapper.writeValueAsString(root).getBytes("UTF-8"))
    val dsv2 = spark.read.format("arcgis")
      .option("mode", "fixture").option("path", fxDir.toString)
      .load()
    println(s"[demo] arcgis DSv2: rows=${dsv2.count()} partitions=${dsv2.rdd.getNumPartitions} " +
      s"pushed=${dsv2.filter(org.apache.spark.sql.functions.col("ISSUE_DATE") >= 1730463300000L + 1000000L).count()}")

    val sqlRes = RefQueries.runAllSql(spark, violations, weather)
    val dfRes = RefQueries.runAllDf(violations, weather)
    for (q <- Seq("qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh")) {
      val s = sqlRes(q).collect().map(_.toString).mkString("; ")
      val d = dfRes(q).collect().map(_.toString).mkString("; ")
      val tag = if (s == d) "sql==df" else s"sql!=df DF=$d"
      println(s"[demo] $q ($tag): $s")
    }
    spark.stop()
  }
}
