package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ancestor closure of a forest by POINTER DOUBLING: after round k the
  * closure holds every (node, ancestor, depth) with depth <= 2^k, so a
  * depth-D hierarchy completes in ceil(log2 D) rounds — the same
  * round-compression idea as the large-star/small-star connected
  * components (ops/ConnectedComponents.scala), applied to reachability.
  *
  * Spark has no recursive CTE; the naive translation iterates D times
  * (one join per LEVEL). Doubling joins the closure with ITSELF —
  * R ∪ R∘R each round — so a 2^20-deep chain needs 20 rounds, not a
  * million. Each round is one equi-join + union + distinct (all
  * shuffle-partitioned on the join key) and one localCheckpoint to cut
  * the growing lineage; the fixpoint test rides the checkpoint's
  * materialization count.
  *
  * In a forest the ancestor at each depth is unique, so |closure| =
  * Σ depth(node) — linear × depth, never quadratic. (On a general DAG
  * the same loop computes reachability with path-length multiplicity
  * collapsed by the distinct.)
  */
object TransitiveClosure {

  /** edges: (child, parent) one row per child (a forest). Returns
    * (node, ancestor, depth) for every proper ancestor, depth >= 1.
    */
  def ancestors(edges: DataFrame): DataFrame = {
    var closure = edges.toDF("node", "ancestor")
      .withColumn("depth", lit(1L))
      .localCheckpoint(true)
    var size = closure.count()
    var grown = true
    while (grown) {
      val next = closure
        .union(
          closure.as("a").join(closure.as("b"),
            col("a.ancestor") === col("b.node"))
            .select(col("a.node").as("node"), col("b.ancestor").as("ancestor"),
              (col("a.depth") + col("b.depth")).as("depth")))
        .distinct()
        .localCheckpoint(true)
      val n = next.count()
      grown = n > size
      size = n
      closure = next
    }
    closure
  }
}
