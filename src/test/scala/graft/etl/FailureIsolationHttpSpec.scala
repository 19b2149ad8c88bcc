package graft.etl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.LocalDate

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ST4 driven END-TO-END through the real HTTP stack (VERDICT r10
  * item 7): a live local server speaks the ArcGIS count-then-page
  * protocol (ref: etl/daily_load/violation_etl_daily.py:153-194) and
  * 500s every request whose pushed ISSUE_DATE range covers one
  * mid-range day — the failure enters through HttpArcGisFetcher and the
  * DSv2 source, not a Scala-level fake. Proves the reference's per-day
  * isolation semantics (violation_etl_daily.py:332-351, SURVEY §8.4)
  * hold through the full stack:
  *
  *  - faithful mode: the failed day is reported, later days land, the
  *    MAX watermark moves PAST the gap, and the next run never retries;
  *  - backfillGaps: the healed day loads, the gap closes, the watermark
  *    is unchanged in both modes.
  */
class FailureIsolationHttpSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def ld(s: String): LocalDate = LocalDate.parse(s)
  private def dayMs(d: String): Long =
    java.time.Instant.parse(s"${d}T00:00:00Z").toEpochMilli

  private val days = Seq("2024-09-01", "2024-09-02", "2024-09-03")

  /** In-memory ArcGIS features: 3 rows per day, OBJECTID unique. */
  private val features: Seq[ObjectNode] =
    days.zipWithIndex.flatMap { case (d, di) =>
      (0 until 3).map { i =>
        val attrs = mapper.createObjectNode()
        attrs.put("OBJECTID", (di * 1000 + i).toLong)
        attrs.put("ISSUE_DATE", dayMs(d) + 36000000L + i) // 10:00 + i ms
        attrs.put("ISSUING_AGENCY_NAME", "MPD")
        attrs.put("FINE_AMOUNT", "100")
        attrs.put("VIOLATION_PROCESS_DESC", s"DESC $i")
        attrs
      }
    }

  /** The day whose requests the server rejects; None = healed. */
  @volatile private var outageDay: Option[String] = None

  private def inRange(msLo: Long, msHi: Long, day: String): Boolean =
    dayMs(day) >= msLo && dayMs(day) < msHi

  private def handle(ex: HttpExchange): Unit = {
    val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    // pushed predicate: "ISSUE_DATE >= lo AND ISSUE_DATE < hi"
    // (a "1=1" where — no pushdown — must read as no range, not (1,1))
    val range = "ISSUE_DATE >= (\\d+) AND ISSUE_DATE < (\\d+)".r.findFirstMatchIn(
      params.getOrElse("where", "")).map(m => (m.group(1).toLong, m.group(2).toLong))
    val failed = outageDay.exists(d => range.exists { case (lo, hi) => inRange(lo, hi, d) })
    val (code, body) =
      if (failed) (500, "injected mid-range outage")
      else {
        val matched = range match {
          case Some((lo, hi)) => features.filter { a =>
            val t = a.get("ISSUE_DATE").asLong; t >= lo && t < hi
          }
          case None => features
        }
        if (params.get("returnCountOnly").contains("true"))
          (200, s"""{"count":${matched.size}}""")
        else {
          val off = params.getOrElse("resultOffset", "0").toInt
          val lim = params.getOrElse("resultRecordCount", "1000").toInt
          val root = mapper.createObjectNode()
          val arr = root.putArray("features")
          matched.slice(off, off + lim).foreach { a =>
            arr.add(mapper.createObjectNode().set[ObjectNode]("attributes", a))
          }
          (200, mapper.writeValueAsString(root))
        }
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Weather leg rides a plain fixture — the failure drive targets the
    * violations leg's HTTP path.
    */
  private def vcFixtureDir(): String = {
    val dir = Files.createTempDirectory("st4-vc")
    val root = mapper.createObjectNode()
    val arr = root.putArray("days")
    days.foreach { d =>
      val n = mapper.createObjectNode()
      n.put("datetime", d)
      n.put("tempmax", 60.0); n.put("tempmin", 40.0); n.put("temp", 50.0)
      n.put("precip", 0.0); n.put("humidity", 70.0); n.put("windspeed", 8.0)
      n.put("conditions", "Clear")
      arr.add(n)
    }
    Files.write(dir.resolve("days.json"),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("ST4 end-to-end over live HTTP: gap in faithful mode, closed by backfillGaps") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/arcgis", handle _)
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/arcgis"
      val aOpts = Map("mode" -> "http", "url" -> url, "layer" -> "0")
      val base = Files.createTempDirectory("st4-lake").resolve("lake").toString
      val fw: LocalDate => org.apache.spark.sql.DataFrame =
        IncrementalRunner.fetchWeatherViaSource(spark,
          Map("mode" -> "fixture", "path" -> vcFixtureDir()))
      val fv: LocalDate => org.apache.spark.sql.DataFrame =
        IncrementalRunner.fetchViolationsViaSource(spark, aOpts)
      val cold = ld("2024-09-01")
      def run(today: String, backfill: Boolean = false) =
        IncrementalRunner.runDaily(spark, base, fw, fv, ld(today),
          backfillGaps = backfill,
          weatherColdStart = cold, violationsColdStart = cold)
      val vPath = IncrementalRunner.violationsPath(base)

      // mid-range outage: 09-02 fails AT THE SERVER; 09-01 and 09-03 land
      outageDay = Some("2024-09-02")
      val r1 = run("2024-09-04")
      assert(r1.violations.loaded == Seq(ld("2024-09-01"), ld("2024-09-03")))
      assert(r1.violations.failed.map(_._1) == Seq(ld("2024-09-02")))
      // watermark moved PAST the failed day — the reference's semantics
      assert(Incremental.watermark(spark, vPath, "violation_date")
        .contains(ld("2024-09-03")))

      // faithful mode after the outage heals: up to date, gap NOT retried
      outageDay = None
      val r2 = run("2024-09-04")
      assert(r2.violations.skipped)
      assert(Incremental.gaps(spark, vPath, "violation_date", cold)
        == Seq(ld("2024-09-02")))
      assert(spark.read.parquet(vPath).count() == 6)

      // backfillGaps: the gap loads through the same HTTP path; lake whole
      val r3 = run("2024-09-04", backfill = true)
      assert(r3.violations.loaded == Seq(ld("2024-09-02")))
      assert(r3.violations.failed.isEmpty)
      assert(Incremental.gaps(spark, vPath, "violation_date", cold).isEmpty)
      assert(Incremental.watermark(spark, vPath, "violation_date")
        .contains(ld("2024-09-03"))) // unchanged by the backfill
      val v = spark.read.parquet(vPath)
      assert(v.count() == 9)
      assert(v.select(countDistinct(col("violation_id"))).head().getLong(0) == 9)
    } finally server.stop(0)
  }
}
