package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup GROUP
  * RESOLUTION step: near-dup detection emits pairs, but a pipeline keeps
  * one survivor per connected GROUP (a~b, b~c means a,c are dups even if
  * never directly compared).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round takes the min of its own and its
  * neighbors' labels; converged when no label changes. Exact (not
  * hop-bounded): the loop runs until a fixpoint, reaching it in
  * O(diameter) rounds — and dup components are shallow (stars/chains of
  * near-identical docs), so rounds stay in the single digits at any
  * corpus size. Per round: one shuffle join + one aggregation; the only
  * driver-side value is the scalar changed-count that decides
  * termination.
  *
  * Lineage control: each round's labels are EAGERLY localCheckpoint'ed —
  * without truncation the plan of round k contains every prior round and
  * planning blows up exponentially (measured: OOM on a 276k-edge graph).
  * localCheckpoint trades recompute-on-executor-loss for bounded plans;
  * a cluster deployment wanting fault tolerance should set a reliable
  * checkpoint dir and use checkpoint() instead.
  */
object ConnectedComponents {

  /** edges: two long-ish columns (src, dst), undirected (one direction is
    * enough). Returns (id, component) — component = min vertex id in the
    * connected component, every vertex of every edge present.
    */
  def components(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst")
    val adj = e.union(e.select(col("dst"), col("src"))).distinct().persist()
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist()
    var changed = 1L
    while (changed > 0) {
      val nmin = adj.as("a")
        .join(labels.as("l"), col("a.dst") === col("l.id"))
        .groupBy(col("a.src").as("id"))
        .agg(min(col("l.comp")).as("nmin"))
      val updated = labels.as("x")
        .join(nmin.as("n"), Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("next"))
        .persist()
      changed = updated.filter(col("next") < col("comp")).count()
      val prev = labels
      // eager checkpoint BEFORE dropping the parent cache: the new labels
      // must be concrete data, not a view whose lineage chains through
      // every earlier round
      labels = updated.select(col("id"), col("next").as("comp"))
        .localCheckpoint(true)
      updated.unpersist()
      prev.unpersist()
    }
    adj.unpersist()
    labels
  }
}
