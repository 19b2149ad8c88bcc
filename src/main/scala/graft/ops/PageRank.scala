package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact integer micro-units (1e-12), so every engine that
  * repeats the formula gets bit-identical ranks — no floating-point
  * accumulation order to disagree about.
  *
  * Per iteration: pr'(v) = (15·S) div (100·N) + (85 · Σ_{u→v} pr(u) div
  * outdeg(u)) div 100, with S = 1e12 and div the truncating integer
  * division (identical to DuckDB `//` on the non-negative operands used
  * here). The damping split 0.15/0.85 is exact in integers; the div per
  * edge loses at most outdeg-1 micro-units of mass per node per round —
  * deterministic, and reproduced verbatim by the unrolled oracle CTEs.
  * Dangling nodes (outdeg 0) contribute nothing — their mass is dropped,
  * not redistributed, again matching the oracle formula exactly.
  *
  * Scale shape: one equi-join pr⋈edges (both shuffle-partitioned on the
  * source key) and one map-side-combinable groupBy(dst) per iteration;
  * nodes and ranks are one row per vertex throughout. The node count is
  * the single bounded driver scalar. Lineage is cut per round with a
  * localCheckpoint, as in [[ConnectedComponents]].
  */
object PageRank {

  val Scale = 1000000000000L

  /** edges: (src, dst); nodes: the full vertex universe (isolated
    * vertices keep the base rank). Returns (node, pr) in micro-units.
    */
  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val e = edges.toDF("src", "dst")
    val vs = nodes.toDF("node").distinct().localCheckpoint(true)
    val n = vs.count() // bounded driver scalar: |V|
    val base = (15L * Scale) / (100L * n)
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    var pr = vs.withColumn("pr", lit(Scale / n))
    for (_ <- 1 to iters) {
      val sums = eo.join(pr, eo("src") === pr("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      pr = vs.join(sums, vs("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
