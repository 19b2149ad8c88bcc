package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration with degree-ordered orientation (the MapReduce
  * classic: Suri & Vassilvitskii WWW'11). Each undirected edge is
  * oriented from its lower (degree, id) endpoint to the higher; wedges
  * are then built by self-joining the oriented adjacency on the CENTER
  * vertex and closed by one more equi-join. Because every vertex's
  * out-degree under this orientation is O(√m) on any graph (and O(α)
  * for arboricity α), the wedge explosion is bounded even when raw
  * degrees are power-law — a hub with a million neighbors fans out its
  * wedges across the many low-degree endpoints instead of materializing
  * deg² pairs on one key. All three steps are shuffle-partitioned
  * equi-joins; nothing is quadratic in a vertex's raw degree.
  */
object TriangleCount {

  /** edges: (x, y) in any orientation, duplicates and self-loops
    * tolerated. Returns one row per triangle as the numerically sorted
    * vertex triple (a, b, c), a < b < c.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.toDF("x", "y").filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(true)
    // wedge (v1, v2) around center u, ordered v1 <(deg,id) v2 so the
    // closing edge — if present — is oriented exactly v1 -> v2
    val wedges = oriented.as("w1").join(oriented.as("w2"),
        col("w1.u") === col("w2.u") &&
          (col("w1.dv") < col("w2.dv") ||
            (col("w1.dv") === col("w2.dv") && col("w1.v") < col("w2.v"))))
      .select(col("w1.u").as("p"), col("w1.v").as("v1"), col("w2.v").as("v2"))
    wedges.join(oriented.select(col("u").as("v1"), col("v").as("v2")),
        Seq("v1", "v2"))
      .select(array_sort(array(col("p"), col("v1"), col("v2"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }
}
