package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Graph analytics over the user universe: PageRank and triangle
  * enumeration, next to the existing connected components and ancestor
  * closure. Both fixtures derive a deterministic graph from the distinct
  * event users (arbitrary but reproducible in any engine), and both
  * oracles replay the exact integer formula — PageRank as three unrolled
  * iteration CTEs standing in for the loop Spark runs, triangles as the
  * textbook three-way self-join the oriented plan must reproduce.
  */
object GraphQueries {

  private def userNodes(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).filter(col("user_id").isNotNull)
      .select(col("user_id").as("node")).distinct()

  // --- PageRank (integer-exact, 3 iterations) ---
  // Fixture: the functional graph u -> (u*u + 7) mod (max+1) over the
  // distinct users, semi-joined so the target must exist (guards a
  // non-contiguous id space). The quadratic map collides heavily at
  // every scale (an affine map degenerates to a permutation whenever the
  // multiplier is coprime to m — uniform ranks), so sinks collect many
  // predecessors and ranks separate over 3 rounds.
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val stats = nodes.agg((max(col("node")) + 1).as("m"))
    val edges = nodes.crossJoin(broadcast(stats))
      .select(col("node").as("src"),
        ((col("node") * col("node") + 7) % col("m")).as("dst"))
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      // a USING join moves the join column first — restore (src, dst)
      // order before the op's positional toDF
      .select(col("src"), col("dst"))
    graft.ops.PageRank.ranks(edges, nodes, iters = 3)
      .select(col("node").as("user_id"), col("pr"))
      .orderBy(col("pr").desc, col("user_id"))
  }

  val qPagerankOracle: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.node,
         |         CAST((SELECT 15000000000000 // (100 * n) FROM stats)
         |              + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT eo.dst, CAST(sum(p.pr // eo.outdeg) AS BIGINT) AS s
         |    FROM eo JOIN $prev p ON eo.src = p.node GROUP BY 1) s
         |  ON n.node = s.dst)""".stripMargin
    s"""WITH nodes AS (
       |  SELECT DISTINCT user_id AS node FROM events WHERE user_id IS NOT NULL),
       |stats AS (SELECT max(node) + 1 AS m, count(*) AS n FROM nodes),
       |edges AS (
       |  SELECT u.node AS src, (u.node * u.node + 7) % s.m AS dst
       |  FROM nodes u CROSS JOIN stats s
       |  WHERE (u.node * u.node + 7) % s.m IN (SELECT node FROM nodes)),
       |eo AS (
       |  SELECT e.src, e.dst, o.outdeg
       |  FROM edges e JOIN (
       |    SELECT src, count(*) AS outdeg FROM edges GROUP BY 1) o USING (src)),
       |it0 AS (
       |  SELECT node, CAST((SELECT 1000000000000 // n FROM stats) AS BIGINT) AS pr
       |  FROM nodes),
       |${iter("it0", "it1")},
       |${iter("it1", "it2")},
       |${iter("it2", "it3")}
       |SELECT node AS user_id, pr FROM it3 ORDER BY pr DESC, node""".stripMargin
  }

  // --- triangle enumeration ---
  // Fixture: the banded graph u ~ u+d for d in {1,2,3} (both endpoints
  // must exist), which carries ~3 triangles per interior node. The Spark
  // plan orients by (degree, id) before building wedges; the oracle is
  // the unoriented a<b<c three-way join — identical triple sets.
  def qTriangleCount(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val edges = nodes
      .select(col("node"), explode(array(lit(1L), lit(2L), lit(3L))).as("d"))
      .select(col("node").as("x"), (col("node") + col("d")).as("y"))
      .join(nodes.select(col("node").as("y")), Seq("y"), "left_semi")
      .select(col("x"), col("y"))
    graft.ops.TriangleCount.triangles(edges)
      .orderBy(col("a"), col("b"), col("c"))
  }

  val qTriangleCountOracle: String =
    """WITH nodes AS (
      |  SELECT DISTINCT user_id AS node FROM events WHERE user_id IS NOT NULL),
      |edges AS (
      |  SELECT u.node AS a, u.node + d.d AS b
      |  FROM nodes u CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (2), (3)) d(d)
      |  WHERE u.node + d.d IN (SELECT node FROM nodes))
      |SELECT e1.a AS a, e1.b AS b, e2.b AS c
      |FROM edges e1
      |JOIN edges e2 ON e2.a = e1.b
      |JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
      |ORDER BY 1, 2, 3""".stripMargin

  /** name -> query builder, for SparkEntry. */
  // --- HITS hubs & authorities (integer-exact, 2 unrolled rounds) ---
  // Kleinberg's mutual-reinforcement pair over the same functional
  // graph as PageRank: auth(v) = Σ hub of in-neighbors, hub(u) = Σ auth
  // of out-neighbors, alternating. The usual L2 normalization only
  // rescales each vector, so RANKINGS are preserved without it — and
  // dropping it keeps every score an exact BIGINT sum of integer counts
  // (auth1 = indegree, hub1 = Σ indeg of targets, auth2 = Σ hub1 of
  // sources): zero doubles anywhere, so both engines agree bit-for-bit
  // with no rounding discipline at all. Each round is one equi-join +
  // one map-side-combinable groupBy — the PageRank shuffle shape.
  def qHits(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val stats = nodes.agg((max(col("node")) + 1).as("m"))
    val edges = nodes.crossJoin(broadcast(stats))
      .select(col("node").as("src"),
        ((col("node") * col("node") + 7) % col("m")).as("dst"))
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .transform(graft.CacheScope.persist)
    val auth1 = edges.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
    // hub1 feeds BOTH the auth2 round and the final report join —
    // persist it (like edges) or the auth1→hub1 chain plans twice
    val hub1 = edges.join(auth1, "dst")
      .groupBy(col("src")).agg(sum(col("a1")).as("h1"))
      .transform(graft.CacheScope.persist)
    val auth2 = edges.join(hub1, "src")
      .groupBy(col("dst")).agg(sum(col("h1")).as("a2"))
    nodes
      .join(auth2.select(col("dst").as("node"), col("a2")), Seq("node"), "left")
      .join(hub1.select(col("src").as("node"), col("h1")), Seq("node"), "left")
      .select(col("node").as("user_id"),
        coalesce(col("a2"), lit(0L)).as("authority"),
        coalesce(col("h1"), lit(0L)).as("hub"))
      .orderBy(col("authority").desc, col("user_id"))
      .limit(15)
  }

  val qHitsOracle: String =
    """WITH nodes AS (
      |  SELECT DISTINCT user_id AS node FROM events WHERE user_id IS NOT NULL),
      |stats AS (SELECT max(node) + 1 AS m FROM nodes),
      |edges AS (
      |  SELECT u.node AS src, (u.node * u.node + 7) % s.m AS dst
      |  FROM nodes u CROSS JOIN stats s
      |  WHERE (u.node * u.node + 7) % s.m IN (SELECT node FROM nodes)),
      |auth1 AS (
      |  SELECT dst, CAST(count(*) AS BIGINT) AS a1 FROM edges GROUP BY 1),
      |hub1 AS (
      |  SELECT e.src, CAST(sum(a.a1) AS BIGINT) AS h1
      |  FROM edges e JOIN auth1 a ON e.dst = a.dst GROUP BY 1),
      |auth2 AS (
      |  SELECT e.dst, CAST(sum(h.h1) AS BIGINT) AS a2
      |  FROM edges e JOIN hub1 h ON e.src = h.src GROUP BY 1)
      |SELECT n.node AS user_id,
      |       CAST(coalesce(a.a2, 0) AS BIGINT) AS authority,
      |       CAST(coalesce(h.h1, 0) AS BIGINT) AS hub
      |FROM nodes n
      |LEFT JOIN auth2 a ON a.dst = n.node
      |LEFT JOIN hub1 h ON h.src = n.node
      |ORDER BY authority DESC, user_id
      |LIMIT 15""".stripMargin

  // --- degree assortativity (Newman 2002) ---
  // Do high-degree nodes attach to high-degree nodes? Pearson r over
  // the edge list of (deg(src), deg(dst)) — negative on hub-and-spoke
  // graphs, positive on social graphs; the one-number structure summary
  // a graph pipeline reports next to the degree histogram. Shape: one
  // degree aggregation (union of endpoints, map-side combinable), one
  // join of the edge list to the degree table per endpoint, and the
  // autocorr determinism recipe — all sufficient statistics BIGINT,
  // the double closed form evaluated once identically in both engines.
  def qAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val stats = nodes.agg((max(col("node")) + 1).as("m"))
    val edges = nodes.crossJoin(broadcast(stats))
      .select(col("node").as("src"),
        ((col("node") * col("node") + 7) % col("m")).as("dst"))
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .transform(graft.CacheScope.persist)
    // persisted (optimization r15): deg is joined once per endpoint and
    // the union + count re-ran per reference (stage-metrics probe:
    // paired heavy stages); one long per node — metadata-scale
    val deg = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .transform(graft.CacheScope.persist)
    edges
      .join(deg.select(col("node").as("src"), col("deg").as("xd")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("yd")), "dst")
      .agg(count(lit(1)).as("n"),
        sum(col("xd")).as("sx"), sum(col("yd")).as("sy"),
        sum(col("xd") * col("yd")).as("sxy"),
        sum(col("xd") * col("xd")).as("sxx"),
        sum(col("yd") * col("yd")).as("syy"))
      .select(col("n").as("n_edges"),
        round(expr(
          """(n * sxy - sx * sy) /
            | sqrt(nullif((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy), 0.0))"""
            .stripMargin), 5).as("assortativity"))
  }

  val qAssortativityOracle: String =
    """WITH nodes AS (
      |  SELECT DISTINCT user_id AS node FROM events WHERE user_id IS NOT NULL),
      |stats AS (SELECT max(node) + 1 AS m FROM nodes),
      |edges AS (
      |  SELECT u.node AS src, (u.node * u.node + 7) % s.m AS dst
      |  FROM nodes u CROSS JOIN stats s
      |  WHERE (u.node * u.node + 7) % s.m IN (SELECT node FROM nodes)),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
      |  GROUP BY 1),
      |j AS (
      |  SELECT dx.deg AS xd, dy.deg AS yd
      |  FROM edges e
      |  JOIN deg dx ON e.src = dx.node
      |  JOIN deg dy ON e.dst = dy.node),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(xd) AS BIGINT) AS sx, CAST(sum(yd) AS BIGINT) AS sy,
      |         CAST(sum(xd * yd) AS BIGINT) AS sxy,
      |         CAST(sum(xd * xd) AS BIGINT) AS sxx,
      |         CAST(sum(yd * yd) AS BIGINT) AS syy
      |  FROM j)
      |SELECT n AS n_edges,
      |       round((n * sxy - sx * sy) /
      |             sqrt(nullif((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy), 0.0)), 5)
      |         AS assortativity
      |FROM s""".stripMargin

  // --- k-core (bounded parallel peel) ---
  // Fixture: the union of the banded graph u ~ u+{1,2,3} (lattice, deg
  // <= 6) and the functional graph u -> (u*u+7) mod m, symmetrized —
  // dense enough that the 5-core is non-trivial but keeps real peel
  // casualties (gap-adjacent lattice nodes and the deg-4 tail). Same
  // bounded-loop contract as qPagerank: EXACTLY 3 parallel-peel rounds,
  // which the oracle unrolls as 3 CTE pairs; KCoreSpec asserts rounds 3
  // and 4 agree at the gated scale factors, so the bounded form is the
  // true 5-core on gated data.
  private[queries] def kcoreEdges(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val stats = nodes.agg((max(col("node")) + 1).as("m"))
    val fwd = nodes.crossJoin(broadcast(stats))
      .select(col("node").as("src"),
        ((col("node") * col("node") + 7) % col("m")).as("dst"))
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .unionByName(nodes
        .select(col("node"), explode(array(lit(1L), lit(2L), lit(3L))).as("d"))
        .select(col("node").as("src"), (col("node") + col("d")).as("dst"))
        .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
  }

  def qKCore(spark: SparkSession, dir: String): DataFrame =
    graft.ops.KCore.peel(kcoreEdges(spark, dir), k = 5, rounds = 3)
      .select(col("node").as("user_id"), col("deg"))
      .orderBy(col("user_id"))

  val qKCoreOracle: String = {
    def round(prev: String, i: Int): String =
      s"""s$i AS (
         |  SELECT src AS node FROM $prev GROUP BY 1 HAVING count(*) >= 5),
         |e$i AS (
         |  SELECT e.src, e.dst FROM $prev e
         |  JOIN s$i a ON e.src = a.node JOIN s$i b ON e.dst = b.node)""".stripMargin
    s"""WITH nodes AS (
       |  SELECT DISTINCT user_id AS node FROM events WHERE user_id IS NOT NULL),
       |stats AS (SELECT max(node) + 1 AS m FROM nodes),
       |fwd AS (
       |  SELECT u.node AS src, (u.node * u.node + 7) % s.m AS dst
       |  FROM nodes u CROSS JOIN stats s
       |  WHERE (u.node * u.node + 7) % s.m IN (SELECT node FROM nodes)
       |  UNION ALL
       |  SELECT u.node AS src, u.node + d.d AS dst
       |  FROM nodes u CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (2), (3)) d(d)
       |  WHERE u.node + d.d IN (SELECT node FROM nodes)),
       |e0 AS (
       |  SELECT DISTINCT src, dst FROM
       |    (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)
       |  WHERE src <> dst),
       |${round("e0", 1)},
       |${round("e1", 2)},
       |${round("e2", 3)}
       |SELECT src AS user_id, CAST(count(*) AS BIGINT) AS deg
       |FROM e3 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- reciprocity + degree distribution (graph health report) ---
  // The two summary statistics read before trusting any graph
  // algorithm's output: what fraction of directed edges are
  // reciprocated (one self-join on the reversed pair, integer ppm) and
  // the out-degree distribution in power-of-two buckets (1 + floor
  // log2 via bit_length of a BIGINT — the same integer in both
  // engines, no floating log). Same deterministic edge fixture as
  // qPagerank; both stats are metadata-scale after one degree
  // aggregation.
  def qGraphHealth(spark: SparkSession, dir: String): DataFrame = {
    val nodes = userNodes(spark, dir)
    val stats = nodes.agg((max(col("node")) + 1).as("m"))
    val edges = nodes.crossJoin(broadcast(stats))
      .select(col("node").as("src"),
        ((col("node") * col("node") + 7) % col("m")).as("dst"))
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(graft.CacheScope.persist)
    val recip = edges.as("a")
      .join(edges.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"),
        "left_semi")
      .agg(count(lit(1)).as("n_recip"))
    val tot = edges.agg(count(lit(1)).as("n_edges"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      // exact integer floor(log2): binary-digit count minus one — no
      // floating log near power-of-two boundaries
      .withColumn("bucket", expr("CAST(length(bin(outdeg)) - 1 AS INT)"))
    val degHist = deg.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"))
    degHist.crossJoin(broadcast(recip)).crossJoin(broadcast(tot))
      .select(col("bucket").as("log2_outdeg"), col("n_nodes"),
        col("n_edges"), expr("1000000 * n_recip div n_edges").as("recip_ppm"))
      .orderBy(col("log2_outdeg"))
  }

  val qGraphHealthOracle: String =
    """WITH n AS (SELECT DISTINCT user_id AS node FROM events),
      |m AS (SELECT max(node) + 1 AS m FROM n),
      |e AS (
      |  SELECT DISTINCT node AS src, (node * node + 7) % m.m AS dst
      |  FROM n CROSS JOIN m
      |  WHERE (node * node + 7) % m.m IN (SELECT node FROM n)
      |    AND node <> (node * node + 7) % m.m),
      |r AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_recip FROM e a
      |  WHERE EXISTS (SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src)),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
      |d AS (
      |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
      |h AS (
      |  SELECT CAST(length(bin(outdeg)) - 1 AS INT) AS log2_outdeg,
      |         CAST(count(*) AS BIGINT) AS n_nodes
      |  FROM d GROUP BY 1)
      |SELECT h.log2_outdeg, h.n_nodes, t.n_edges,
      |       CAST(1000000 * r.n_recip // t.n_edges AS BIGINT) AS recip_ppm
      |FROM h CROSS JOIN r CROSS JOIN t
      |ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_health" -> (qGraphHealth _),
    "q_kcore" -> (qKCore _),
    "q_assortativity" -> (qAssortativity _),
    "q_pagerank" -> (qPagerank _),
    "q_triangle_count" -> (qTriangleCount _),
    "q_hits" -> (qHits _))

  /** name -> DuckDB oracle SQL, for the driver gate. */
  def oracles: Map[String, String] = Map(
    "q_graph_health" -> qGraphHealthOracle,
    "q_kcore" -> qKCoreOracle,
    "q_assortativity" -> qAssortativityOracle,
    "q_pagerank" -> qPagerankOracle,
    "q_triangle_count" -> qTriangleCountOracle,
    "q_hits" -> qHitsOracle)
}
