package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[HostProbe]] feeds the box-state stamp embedded in every bench and
  * sentinel artifact. Its readings are host-dependent, so the spec pins
  * what CAN be pinned on any host: the measurement completes quickly,
  * the numbers are physical (a real pipe wakeup cannot be sub-100ns or
  * over a second), steal is a percentage or the explicit −1 sentinel,
  * and the JSON fragment parses and round-trips the values.
  */
class HostProbeSpec extends AnyFunSuite {
  test("reading is physical, fast, and leak-free across repeats") {
    val t0 = System.nanoTime()
    val r = HostProbe.measure(roundTrips = 2000)
    val wallMs = (System.nanoTime() - t0) / 1e6
    assert(wallMs < 30000, s"probe took ${wallMs}ms")
    assert(r.ctxSwitchUs > 0.1 && r.ctxSwitchUs < 1e6,
      s"implausible ctx switch: ${r.ctxSwitchUs}us")
    assert(r.stealPct == -1.0 || (r.stealPct >= 0 && r.stealPct <= 100),
      s"steal out of range: ${r.stealPct}")
    // repeated probes must not exhaust fds (each opens 2 pipes = 4 fds)
    (1 to 20).foreach(_ => HostProbe.measure(roundTrips = 50))
  }

  test("json fragment parses and carries both fields") {
    val r = HostProbe.Reading(ctxSwitchUs = 28.25, stealPct = 1.5)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.json)
    assert(node.get("ctx_switch_us").asDouble() == 28.3) // %.1f rounding
    assert(node.get("steal_pct").asDouble() == 1.5)
  }
}
