package graft.etl

import java.time.LocalDate

/** Month-key → (MapServer base URL, layer id) routing (SURVEY.md §2.1 S3)
  * and the day → epoch-ms range derivation the source pushes server-side.
  *
  * ref: etl/daily_load/violation_etl_daily.py:18-72 and
  *      etl/full_load/violation_etl_history.py:34-39 — the 2024 server
  *      hosts Sep–Dec as layers 8–11; the 2025 server hosts Jan–Dec as
  *      layers 0–11. Unknown months raise, as in the reference.
  */
object LayerRouting {

  val Url2024 =
    "https://maps2.dcgis.dc.gov/dcgis/rest/services/DCGIS_DATA/Violations_Moving_2024/MapServer"
  val Url2025 =
    "https://maps2.dcgis.dc.gov/dcgis/rest/services/DCGIS_DATA/Violations_Moving_2025/MapServer"

  private val layer2024: Map[String, Int] =
    Seq("2024-09", "2024-10", "2024-11", "2024-12").zipWithIndex
      .map { case (m, i) => m -> (8 + i) }.toMap
  private val layer2025: Map[String, Int] =
    (1 to 12).map(m => f"2025-$m%02d" -> (m - 1)).toMap

  /** ref: violation_etl_daily.py:46-58 (get_layer_url). Base URLs honor
    * the VIOLATIONS_*_BASE_URL env overrides (EtlConfig / S10).
    */
  def layerUrl(monthKey: String): (String, Int) = {
    val (base, layer) =
      if (monthKey.startsWith("2024"))
        (EtlConfig.violations2024BaseUrl, layer2024.get(monthKey))
      else (EtlConfig.violations2025BaseUrl, layer2025.get(monthKey))
    layer match {
      case Some(l) => (base, l)
      case None =>
        throw new IllegalArgumentException(s"No layer mapping for month_key=$monthKey")
    }
  }

  /** ref: violation_etl_daily.py:61-62 (date_to_month_key). */
  def monthKey(d: LocalDate): String = f"${d.getYear}%04d-${d.getMonthValue}%02d"

  /** Day → [startMs, endMs) UTC epoch-millisecond range for the pushed
    * ISSUE_DATE predicate. ref: violation_etl_daily.py:65-72.
    */
  def dayToMsRange(d: LocalDate): (Long, Long) = {
    val start = d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    (start, start + 86400000L)
  }

  /** DSv2 options for one month's scan against the fixture or http
    * backend — the engine-side form of the reference's routing.
    */
  def sourceOptions(monthKey: String, pageSize: Int = EtlConfig.violationsPageSize): Map[String, String] = {
    val (url, layer) = layerUrl(monthKey)
    Map("mode" -> "http", "url" -> url, "layer" -> layer.toString,
      "pageSize" -> pageSize.toString)
  }
}

/** Environment-driven configuration surface (SURVEY.md §2.1 S10) with the
  * reference's variable names (ref: .env.example:1-40). Secrets stay
  * caller-resolved; this only carries endpoints and tuning knobs.
  */
object EtlConfig {
  val defaultPageSize = 2000 // ref: violation_etl_daily.py:43 (CHUNK)

  private def env(name: String, default: String): String =
    sys.env.getOrElse(name, default)

  def violations2024BaseUrl: String =
    env("VIOLATIONS_2024_BASE_URL", LayerRouting.Url2024)
  def violations2025BaseUrl: String =
    env("VIOLATIONS_2025_BASE_URL", LayerRouting.Url2025)
  def violationsPageSize: Int =
    env("VIOLATIONS_PAGE_SIZE", defaultPageSize.toString).toInt
  def weatherLocation: String =
    env("WEATHER_LOCATION", "Washington,DC")
}
