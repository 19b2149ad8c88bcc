package graft.etl

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Routing pinned to the reference tables
  * (violation_etl_daily.py:18-72).
  */
class LayerRoutingSpec extends AnyFunSuite {

  test("2024 months route to layers 8-11 of the 2024 server") {
    assert(LayerRouting.layerUrl("2024-09") == ((LayerRouting.Url2024, 8)))
    assert(LayerRouting.layerUrl("2024-12") == ((LayerRouting.Url2024, 11)))
  }

  test("2025 months route to layers 0-11 of the 2025 server") {
    assert(LayerRouting.layerUrl("2025-01") == ((LayerRouting.Url2025, 0)))
    assert(LayerRouting.layerUrl("2025-07") == ((LayerRouting.Url2025, 6)))
    assert(LayerRouting.layerUrl("2025-12") == ((LayerRouting.Url2025, 11)))
  }

  test("unmapped months raise, like the reference") {
    intercept[IllegalArgumentException](LayerRouting.layerUrl("2024-08"))
    intercept[IllegalArgumentException](LayerRouting.layerUrl("2026-01"))
  }

  test("month key and ms-range derivations match the reference") {
    assert(LayerRouting.monthKey(LocalDate.parse("2024-11-03")) == "2024-11")
    // 2024-11-01 UTC midnight = 1730419200000
    assert(LayerRouting.dayToMsRange(LocalDate.parse("2024-11-01"))
      == ((1730419200000L, 1730505600000L)))
  }

  test("config surface defaults mirror .env.example") {
    assert(EtlConfig.violationsPageSize == 2000)
    assert(EtlConfig.weatherLocation == "Washington,DC")
    assert(EtlConfig.violations2024BaseUrl.contains("Violations_Moving_2024"))
  }

  test("sourceOptions assemble a DSv2 scan config for a month") {
    val opts = LayerRouting.sourceOptions("2025-03")
    assert(opts("layer") == "2" && opts("pageSize") == "2000"
      && opts("url") == LayerRouting.Url2025)
  }
}
