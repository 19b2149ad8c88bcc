package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps sentinels.json and the Sentinel op registry in lockstep: a
  * renamed/removed op must fail HERE, not silently drop out of the 100×
  * scale gate.
  */
class SentinelConfigSpec extends AnyFunSuite {

  test("every sentinels.json op exists in the registry, with sane ceilings") {
    val f = new java.io.File("sentinels.json")
    assert(f.isFile, "sentinels.json must be checked in at the repo root")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val ops = root.get("ops")
    val registry = Sentinel.ops.map(_._1).toSet
    val it = ops.fieldNames()
    var n = 0
    while (it.hasNext) {
      val name = it.next(); n += 1
      assert(registry.contains(name), s"sentinel op '$name' not in registry")
      val ceiling = ops.get(name).get("ceiling_sec").asDouble()
      val receipt = ops.get(name).get("receipt_sec").asDouble()
      assert(ceiling > receipt, s"$name: ceiling must exceed receipt")
      assert(ceiling <= receipt * 2.5, s"$name: ceiling too slack to catch a 3x regression")
    }
    assert(n >= 10, "the gate covers the ~10 collapse/join-shape-critical ops")
  }

  test("every registry op is gated") {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File("sentinels.json"))
    Sentinel.ops.foreach { case (name, _) =>
      assert(root.get("ops").has(name), s"registry op '$name' missing from sentinels.json")
    }
  }
}
