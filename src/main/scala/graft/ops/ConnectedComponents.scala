package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup GROUP
  * RESOLUTION step: near-dup detection emits pairs, but a pipeline keeps
  * one survivor per connected GROUP (a~b, b~c means a,c are dups even if
  * never directly compared).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * rewrites the edge set:
  *
  *  - large-star: for every vertex u, connect each strictly-LARGER
  *    neighbor to m = min(N(u) ∪ {u});
  *  - small-star: for every vertex u (over edges oriented high→low),
  *    connect each smaller neighbor AND u itself to the minimum.
  *
  * Both steps preserve connectivity, and the pair converges in O(log n)
  * rounds to a fixpoint where every component is a depth-1 star centered
  * at its minimum vertex — unlike min-label propagation, whose round
  * count is the graph DIAMETER and whose per-round state (a label per
  * vertex joined against the full adjacency) never shrinks. Here the
  * edge set itself contracts toward n-per-component star edges after the
  * first round, so later rounds touch far less data. Exact, not
  * approximate: the loop runs to the set-stable fixpoint and the result
  * is cross-checked against a union-find reference (spec) and a
  * recursive-CTE transitive-closure oracle (correctness gate).
  *
  * Lineage control: each round's edge set is EAGERLY localCheckpoint'ed —
  * without truncation the plan of round k contains every prior round and
  * planning blows up exponentially (measured: OOM on a 276k-edge graph
  * with the predecessor algorithm). localCheckpoint trades
  * recompute-on-executor-loss for bounded plans; a cluster deployment
  * wanting fault tolerance should set a reliable checkpoint dir and use
  * checkpoint() instead.
  */
object ConnectedComponents {

  /** edges: two long-ish columns (src, dst), undirected (one direction is
    * enough). Returns (id, comp) — comp = min vertex id in the connected
    * component, every vertex of every edge present (self-loop-only
    * vertices included, labeled themselves).
    *
    * EAGER: calling this runs the resolution NOW — the first
    * localCheckpoint materializes the upstream pair query and the
    * convergence loop executes a job per round. Every builder that
    * composes it (qDedupComponents/Apply/ClusterStats, qErClusters,
    * CorpusPipeline.dedupNear*, dedupGroupBundle) therefore runs
    * graph-scale work at plan-BUILD time; plan-audit/EXPLAIN callers pay
    * it before they see a plan. Unavoidable for an exact fixpoint: the
    * round count is data-dependent, so it cannot live inside one lazy
    * plan.
    */
  def components(edges: DataFrame): DataFrame = {
    // materialize the (possibly expensive) upstream pair query exactly
    // once — both the vertex list and the initial edge set derive from it
    val raw = edges.toDF("src", "dst").localCheckpoint(true)
    val verts = raw.select(col("src").as("id"))
      .union(raw.select(col("dst").as("id")))
      .distinct()
    // canonical high→low orientation; self-loops carry no connectivity.
    // |e| rides the SAME job that materializes the initial edge set (an
    // `observe` metric on the checkpoint pass — the round-loop pattern
    // below, applied here too so no separate count job runs; one job per
    // CC invocation saved, optimization r15).
    val obs0 = org.apache.spark.sql.Observation()
    var e = raw.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct()
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint(true)
    var prevCount = obs0.get("n").asInstanceOf[Long]
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      // large-star over both directions: m(u) = min(N(u) ∪ {u}); every
      // neighbor v > u re-attaches to m. Each undirected edge {a,b}, a<b,
      // is emitted exactly once (from a's star as (b, m(a))), already in
      // high→low orientation because m(a) <= a < b.
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // NO distinct here (optimization r15): duplicates in `large` are
      // bounded — each bidir row emits at most one (v, m) row, so
      // |large| <= 2|e| with or without the dedup — mins2's min is
      // duplicate-insensitive, and the small-star output is distinct'ed
      // below, so the round's edge SET (and hence the round count and
      // the result) is identical while a full exchange + aggregate per
      // round disappears.
      val large = bidir.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star on the high→low output: the group of u holds exactly
      // its smaller neighbors; all of them plus u re-attach to the min.
      val mins2 = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      // exact set-equality fixpoint test, folded into the SAME job that
      // materializes the round's edge set: a left join marks which new
      // edges already existed, an `observe` metric counts rows and
      // new-only rows during the checkpoint pass, and with the previous
      // round's |e| the symmetric difference is
      //   |new \ old| + (|old| - |new ∩ old|)
      // — no second symmetric-difference action per round. Metrics sit
      // ABOVE the join and BELOW no filter, so nothing can prune rows out
      // from under the counts.
      val obs = org.apache.spark.sql.Observation()
      val marked = small
        .join(e.select(col("u"), col("v"), lit(1).as("_old")), Seq("u", "v"), "left")
        .observe(obs,
          count(lit(1)).as("n"),
          coalesce(sum(when(col("_old").isNull, 1L).otherwise(0L)), lit(0L))
            .as("new_only"))
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val m = obs.get
      val n = m("n").asInstanceOf[Long]
      val newOnly = m("new_only").asInstanceOf[Long]
      changed = newOnly + (prevCount - (n - newOnly))
      val nStable = n == prevCount
      val bigDrop = n * 2 <= prevCount
      prevCount = n
      val prev = e
      e = marked
      prev.unpersist()
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round=$rounds n=$n changed=$changed")
      // Star-forest early exit (optimization r16): the alternation's
      // fixpoints are EXACTLY star forests centered at component minima —
      // the high→low orientation makes every star center its component's
      // min, and a star forest maps to itself under both steps (large-star
      // re-emits each (leaf, m) unchanged, small-star re-attaches each
      // leaf to the same m) — so the set-stability test above always pays
      // one full confirming round after the set first becomes a star
      // forest. Test the new set directly instead: star forest ⟺ every
      // u appears exactly once AND no vertex is on both sides. One small
      // aggregate over the (checkpointed, contracted) set replaces a full
      // round over it — measured rounds 5→4 on the q_er_clusters graph;
      // result identical because the loop would only ever re-confirm this
      // exact set. GATED on the edge count holding steady across the
      // round (the final contraction typically rewrites attachments
      // without changing |e|): an unconditional per-round test measured
      // NEGATIVE at sf0.1 (family A/B 1.13x — R-1 extra dispatch-bound
      // jobs outweigh the one saved round on sub-MB graphs); the gate
      // pays the test only in rounds where the fixpoint is likely —
      // count-stable, OR a >= 2x contraction (a duplicate-saturated
      // graph's final collapse: the simhash corpus graph reaches its
      // star forest in the round that drops 55k -> 12.4k edges).
      if (changed > 0 && (nStable || bigDrop)) {
        val bad = e.select(col("u"), lit(1L).as("s"))
          .union(e.select(col("v").as("u"), lit(0L).as("s")))
          .groupBy(col("u"))
          .agg(sum(col("s")).as("cu"), min(col("s")).as("mi"))
          .filter(col("cu") > 1L || (col("cu") >= 1L && col("mi") === 0L))
        if (bad.isEmpty) {
          changed = 0
          if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
            System.err.println(s"[cc] round=$rounds star-forest early exit")
        }
      }
    }
    if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] rounds=$rounds edges=$prevCount")
    // fixpoint is a star forest centered at component minima: leaves take
    // their center's id, centers (and isolated vertices) take their own
    verts.join(e.select(col("u").as("id"), col("v").as("comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
