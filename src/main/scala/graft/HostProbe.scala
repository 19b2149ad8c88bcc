package graft

/** Workload-free host-health measurement embedded in every bench and
  * sentinel artifact, so a reader can tell from the artifact ALONE
  * whether its timings were taken on a healthy box or during the
  * hypervisor degradation this box exhibits (see BASELINE.md
  * "Round-15 night half": guest idle by load/PSI/swap while pipe
  * ping-pong context-switch latency read 28–62 µs against a healthy
  * 2–6, solo floors of untouched sub-second queries 1.6–3.0×).
  *
  * Two numbers, ~1 s total, no Spark involvement:
  *
  *  - `ctxSwitchUs` — one-byte ping-pong between two threads over a
  *    pair of OS pipes (`java.nio.channels.Pipe` is a real kernel
  *    pipe), so each round trip is two blocking-read wakeups. On a
  *    healthy host a switch costs 2–6 µs; hypervisor vCPU scheduling
  *    delay inflates it 5–20×, and dispatch-dominated sub-second Spark
  *    queries track it almost linearly (they are scheduler/RPC
  *    wakeup chains). This is the mechanism-level reading behind
  *    BASELINE.md's box-state rule — `scripts/box_probe.sh` is the
  *    shell twin with the same calibration.
  *  - `stealPct` — hypervisor steal over the probe's own wall window
  *    from /proc/stat (−1 where /proc is unavailable). ~0 healthy;
  *    1–3% at idle on degraded days.
  *
  * Reading: ctx_switch_us > 10 or steal_pct > 1 ⇒ treat vs-anchor
  * ratios in the same artifact as a box reading, per BASELINE.md's
  * headline-instrument policy (solo floors, interleaved A/Bs, and
  * sentinel ceilings are the code evidence on such days).
  */
object HostProbe {
  final case class Reading(ctxSwitchUs: Double, stealPct: Double) {
    def json: String =
      f"""{"ctx_switch_us":$ctxSwitchUs%.1f,"steal_pct":$stealPct%.2f}"""
  }

  /** user..steal tick counters from the aggregate cpu line. */
  private def cpuTicks(): Option[Array[Long]] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+").drop(1).take(8).map(_.toLong))
      finally src.close()
    } catch { case _: Exception => None }

  def measure(roundTrips: Int = 20000): Reading = {
    val t0 = cpuTicks()
    val p1 = java.nio.channels.Pipe.open()
    val p2 = java.nio.channels.Pipe.open()
    val one = java.nio.ByteBuffer.allocate(1)
    val echo = new Thread(() => {
      val b = java.nio.ByteBuffer.allocate(1)
      try {
        var i = 0
        while (i < roundTrips) {
          b.clear()
          while (b.position() == 0)
            if (p1.source().read(b) < 0)
              throw new java.io.EOFException("probe pipe closed")
          b.flip(); p2.sink().write(b)
          i += 1
        }
      } catch {
        case _: java.nio.channels.ClosedChannelException =>
        case _: Throwable =>
          // an echo death must fail the probe's blocked read loudly
          // (ClosedChannelException), never leave it parked forever
          try p2.sink().close() catch { case _: Exception => }
      }
    })
    echo.setDaemon(true)
    echo.start()
    val ctxUs =
      try {
        val start = System.nanoTime()
        var i = 0
        while (i < roundTrips) {
          one.clear(); one.put(0.toByte); one.flip(); p1.sink().write(one)
          one.clear()
          while (one.position() == 0)
            if (p2.source().read(one) < 0)
              throw new java.io.EOFException("probe echo thread died")
          i += 1
        }
        // 2 wakeups (context switches) per round trip
        (System.nanoTime() - start) / 1e3 / (2.0 * roundTrips)
      } finally {
        echo.join(5000)
        Seq(p1.source(), p1.sink(), p2.source(), p2.sink()).foreach { c =>
          try c.close() catch { case _: Exception => }
        }
      }
    val steal = (t0, cpuTicks()) match {
      case (Some(a), Some(b)) =>
        val d = a.indices.map(k => (b(k) - a(k)).max(0L))
        val tot = d.sum
        if (tot > 0) 100.0 * d(7) / tot else -1.0
      case _ => -1.0
    }
    Reading(ctxUs, steal)
  }
}
