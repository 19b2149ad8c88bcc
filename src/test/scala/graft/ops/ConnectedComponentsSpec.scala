package graft.ops

import graft.SparkSpec

/** Min-label propagation must reach the true component fixpoint —
  * including multi-hop chains where the min id is several edges away.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain: the min id propagates across multiple hops") {
    // 5-4-3-2-1: min (1) is 4 hops from 5
    val got = run((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels") {
    val got = run((10L, 11L), (20L, 21L), (21L, 22L))
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star and triangle resolve to the hub minimum") {
    val got = run((7L, 3L), (7L, 9L), (7L, 8L), (3L, 9L))
    assert(got == Map(3L -> 3L, 7L -> 3L, 8L -> 3L, 9L -> 3L))
  }
}
