package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling: iteratively delete vertices of degree < k until the
  * remaining subgraph has minimum degree >= k (Seidman 1983). The k-core
  * is the standard graph-side density filter — spam/bot subgraph mining,
  * community-seed extraction, or pruning a similarity graph to its
  * stably-connected region before clustering.
  *
  * This implementation runs a FIXED number of peel rounds (the caller
  * pins `rounds`), so the computation is exactly reproducible by an
  * engine that unrolls the same rounds as CTEs — the same bounded-loop
  * contract as [[PageRank]]. Peeling converges in at most |V| rounds but
  * in practice a handful: each round removes every currently-under-k
  * vertex at once (the "parallel peel" schedule, Montresor et al. 2013),
  * and KCoreSpec asserts the fixture converges within the pinned rounds
  * (rounds and rounds+1 agree), so the bounded form IS the true k-core
  * on gated data.
  *
  * Scale shape per round: one map-side-combinable groupBy(src) for
  * degrees and two left-semi joins to restrict the edge set — all
  * hash-partitioned on the vertex key, no windows, no collects. The edge
  * set only shrinks, so round cost is monotonically non-increasing;
  * lineage is cut per round with a localCheckpoint as in
  * [[ConnectedComponents]].
  */
object KCore {

  /** edges: undirected edge set given as SYMMETRIC directed pairs
    * (both (u,v) and (v,u) present, no self-loops — callers symmetrize).
    * Returns (node, deg): vertices surviving `rounds` parallel peels
    * with their degree in the peeled subgraph (vertices that lost every
    * neighbor in the final round drop out with the edges).
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.toDF("src", "dst").localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= k)
        .select(col("src"))
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }
}
