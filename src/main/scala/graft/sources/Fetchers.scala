package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Page-granular access to an ArcGIS-style REST backend.
  *
  * The reference talks to the DC Open Data ArcGIS MapServer with a
  * count-then-page protocol: `returnCountOnly=true` for the total, then
  * `resultOffset`/`resultRecordCount` pages of
  * `{"features":[{"attributes":{...}}]}`
  * (ref: etl/full_load/violation_etl_history.py:73-124) and a server-side
  * `where=ISSUE_DATE >= ms AND ISSUE_DATE < ms` predicate
  * (ref: etl/daily_load/violation_etl_daily.py:153-194).
  *
  * Implementations must be cheap to construct and usable on executors
  * (instances are created per partition from serialized options — the
  * fetcher itself never crosses the wire).
  */
trait ArcGisFetcher {
  def count(issueMsRange: Option[(Long, Long)]): Long
  /** One page of feature attributes, server-side-filtered and paged. */
  def page(offset: Long, limit: Int, issueMsRange: Option[(Long, Long)]): Seq[JsonNode]
}

object ArcGisFetcher {
  /** Builds a fetcher from DSv2 options (executor-side). */
  def apply(options: Map[String, String]): ArcGisFetcher =
    options.getOrElse("mode", "fixture") match {
      case "fixture" => new FixtureArcGisFetcher(options("path"))
      case "http" => new HttpArcGisFetcher(
        options("url"), options.getOrElse("layer", "0"),
        options.getOrElse("timeoutSec", "30").toInt)
      case m => throw new IllegalArgumentException(s"unknown arcgis mode: $m")
    }
}

/** Serves ArcGIS-shaped payloads from local JSON files — fixture mode is a
  * first-class source option (SURVEY.md §7.4: zero-egress test env), not a
  * test hack. The directory holds one `features.json` with the full
  * feature list; the fetcher emulates the server by applying the pushed
  * ISSUE_DATE range and pagination itself, exactly as ArcGIS would.
  */
class FixtureArcGisFetcher(dir: String) extends ArcGisFetcher {
  private lazy val all: Vector[JsonNode] = {
    val mapper = new ObjectMapper()
    val text = new String(
      Files.readAllBytes(Paths.get(dir, "features.json")), StandardCharsets.UTF_8)
    val features = mapper.readTree(text).get("features")
    (0 until features.size).map(i => features.get(i).get("attributes")).toVector
  }

  private def filtered(range: Option[(Long, Long)]): Vector[JsonNode] =
    range match {
      case None => all
      case Some((lo, hi)) => all.filter { a =>
        val n = a.get("ISSUE_DATE")
        n != null && !n.isNull && n.asLong >= lo && n.asLong < hi
      }
    }

  override def count(range: Option[(Long, Long)]): Long = filtered(range).size.toLong

  override def page(offset: Long, limit: Int, range: Option[(Long, Long)]): Seq[JsonNode] =
    filtered(range).slice(offset.toInt, offset.toInt + limit)
}

/** Real-HTTP fetcher against an ArcGIS MapServer query endpoint (the
  * production path; untestable in this zero-egress environment).
  * Mirrors the reference's request shape: `where`, `outFields=*`,
  * `returnGeometry=false`, `f=json`, `resultOffset`/`resultRecordCount`
  * (ref: etl/daily_load/violation_etl_daily.py:166-192).
  */
class HttpArcGisFetcher(url: String, layer: String, timeoutSec: Int)
    extends ArcGisFetcher {
  private def get(params: Map[String, String]): JsonNode = {
    val query = params.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$url/$layer/query?$query"))
      .timeout(java.time.Duration.ofSeconds(timeoutSec)).GET().build()
    val body = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    new ObjectMapper().readTree(body)
  }

  private def whereClause(range: Option[(Long, Long)]): String =
    range.map { case (lo, hi) => s"ISSUE_DATE >= $lo AND ISSUE_DATE < $hi" }
      .getOrElse("1=1")

  override def count(range: Option[(Long, Long)]): Long =
    get(Map("where" -> whereClause(range), "returnCountOnly" -> "true",
      "f" -> "json")).get("count").asLong

  override def page(offset: Long, limit: Int, range: Option[(Long, Long)]): Seq[JsonNode] = {
    val features = get(Map(
      "where" -> whereClause(range), "outFields" -> "*",
      "returnGeometry" -> "false", "f" -> "json",
      "resultOffset" -> offset.toString,
      "resultRecordCount" -> limit.toString)).get("features")
    (0 until features.size).map(i => features.get(i).get("attributes"))
  }
}

/** VisualCrossing timeline access: `{"days":[{...}]}` for a date range
  * (ref: etl/full_load/weather_etl_history.py:54-87,
  *  etl/daily_load/weather_etl_daily.py:91-112).
  */
trait VcFetcher {
  def days(start: String, end: String): Seq[JsonNode]
}

object VcFetcher {
  def apply(options: Map[String, String]): VcFetcher =
    options.getOrElse("mode", "fixture") match {
      case "fixture" => new FixtureVcFetcher(options("path"))
      case "http" => new HttpVcFetcher(
        options("url"), options("location"),
        options.getOrElse("timeoutSec", "60").toInt,
        apiKey = options.getOrElse("key", throw new IllegalArgumentException(
          "vc http mode requires option 'key' (the reference sends key=" +
            "{API_KEY} on every timeline request)")),
        unitGroup = options.getOrElse("unitGroup", "metric"))
      case m => throw new IllegalArgumentException(s"unknown vc mode: $m")
    }
}

/** Fixture-mode timeline: one `days.json` holding every day; range
  * filtering happens here, as the remote API would.
  */
class FixtureVcFetcher(dir: String) extends VcFetcher {
  private lazy val all: Vector[JsonNode] = {
    val mapper = new ObjectMapper()
    val text = new String(
      Files.readAllBytes(Paths.get(dir, "days.json")), StandardCharsets.UTF_8)
    val days = mapper.readTree(text).get("days")
    (0 until days.size).map(days.get).toVector
  }

  override def days(start: String, end: String): Seq[JsonNode] =
    all.filter { d =>
      val dt = d.get("datetime").asText
      dt >= start && dt <= end
    }
}

/** Real-HTTP VisualCrossing timeline fetcher (production path).
  *
  * Request shape mirrors the reference exactly: the API key rides on
  * every request and the unit group is caller-chosen — the full load
  * uses `unitGroup=us` over a `/start/end` range
  * (ref: etl/full_load/weather_etl_history.py:62-69) while the daily
  * load uses `unitGroup=metric` over a single `/date` segment
  * (ref: etl/daily_load/weather_etl_daily.py:96-107).
  */
class HttpVcFetcher(base: String, location: String, timeoutSec: Int,
    apiKey: String, unitGroup: String) extends VcFetcher {

  /** The full request URI (exposed so specs can pin both reference URL
    * shapes without a network). A single-day request (start == end)
    * collapses to the daily load's one-segment form.
    */
  def requestUri(start: String, end: String): String = {
    val span = if (start == end) start else s"$start/$end"
    val key = java.net.URLEncoder.encode(apiKey, "UTF-8")
    s"$base/$location/$span?unitGroup=$unitGroup&include=days&key=$key&contentType=json"
  }

  override def days(start: String, end: String): Seq[JsonNode] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(requestUri(start, end)))
      .timeout(java.time.Duration.ofSeconds(timeoutSec)).GET().build()
    val body = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    val days = new ObjectMapper().readTree(body).get("days")
    (0 until days.size).map(days.get)
  }
}
