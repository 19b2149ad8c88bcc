package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the graph operators that the SQL oracle equality can't
  * state directly: mass conservation and fixpoints for PageRank, and
  * set-exactness of the oriented triangle plan against a brute-force
  * recount.
  */
class GraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("KCore: pendant cascade peels over rounds, K4 core is exact") {
    // K4 on {1,2,3,4} + path 4-5 + pendants 5-8, 5-9. Round 1: 8, 9 die
    // (deg 1); 5 survives (deg 3). Round 2: 5 dies (deg 1 after its
    // pendants left) — the cascade a single-round filter can't see.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 8L), (5L, 9L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r1 = graft.ops.KCore.peel(sym, k = 3, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    val r3 = graft.ops.KCore.peel(sym, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q_kcore: 3 peel rounds is the fixpoint at the gated scale factors") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = GraphQueries.kcoreEdges(spark, dir)
      val r3 = graft.ops.KCore.peel(e, k = 5, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val r4 = graft.ops.KCore.peel(e, k = 5, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(r3.nonEmpty)
      assert(r3 == r4, s"$dir: peel not converged at 3 rounds")
    }
  }

  test("PageRank: a 2-cycle is an exact fixpoint at 500e9 micro-units each") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("node")
    val pr = graft.ops.PageRank.ranks(edges, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("PageRank: asymmetric star has exact hand-computed ranks (orientation-sensitive)") {
    // 1 -> 3, 2 -> 3; 3 dangling. base = 5e10, pr0 = Scale/3.
    // iter1: pr(3) = 5e10 + (85 * 2*(Scale/3)) div 100 = 616666666666
    // iter2+: sources are back at base, pr(3) = 5e10 + 85e9 = 135e9.
    // A reversed edge set (3 -> 1, 3 -> 2) would give a different map,
    // so this also pins the (src, dst) column convention.
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val pr = graft.ops.PageRank.ranks(edges, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 50000000000L, 2L -> 50000000000L, 3L -> 135000000000L))
  }

  test("q_pagerank: mass is conserved up to truncation, base rank is the floor") {
    val rows = GraphQueries.qPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val base = (15L * graft.ops.PageRank.Scale) / (100L * n)
    val total = rows.map(_.getLong(1)).sum
    // each div truncates at most 1 micro-unit per node per round; the
    // functional fixture has outdeg <= 1 so the only loss is the two divs
    // in the update — total stays within a sliver of the full mass
    assert(total <= graft.ops.PageRank.Scale)
    assert(total > graft.ops.PageRank.Scale - 10L * n,
      s"lost more than truncation can explain: $total")
    rows.foreach(r => assert(r.getLong(1) >= base,
      s"node ${r.getLong(0)} below the damping floor"))
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "ranks failed to separate — fixture degenerate?")
  }

  test("TriangleCount: K4 has exactly 4 triangles; noise edges are tolerated") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val edges = (k4 ++ Seq((1L, 1L), (2L, 1L), (2L, 1L))).toDF("x", "y")
    val ts = graft.ops.TriangleCount.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ts == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("q_triangle_count: output equals a brute-force recount of the fixture") {
    val nodes = graft.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().as[Long].collect().toSet
    val edges = for {
      u <- nodes; d <- 1L to 3L if nodes.contains(u + d)
    } yield (u, u + d)
    val es = edges.toSet
    val brute = for {
      (a, b) <- es; c <- nodes
      if c > b && es.contains((b, c)) && es.contains((a, c))
    } yield (a, b, c)
    val got = GraphQueries.qTriangleCount(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "duplicate triangles")
    assert(got.toSet == brute, "triple sets differ from brute force")
    got.foreach { case (a, b, c) => assert(a < b && b < c) }
  }
}
