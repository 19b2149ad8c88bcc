package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.functions.VectorExprs.dot

/** Pins the identical-vector collapse in q_semdedup (round 9): on a feed
  * where the SAME embeddings recur under many vec_ids — the 100×
  * rehearsal shape that made the uncollapsed within-cluster pair join
  * k²-explode (316 s, SURVEY §10.7) — the collapsed query must produce
  * EXACTLY what the uncollapsed definition produces: for every
  * non-keeper vector, the lowest qualifying partner in its cluster and
  * that partner's rounded cosine.
  *
  * The spec replicates the sf0.001 embeddings ×3 under offset ids into
  * a temp dir, runs the production query against it, and compares with
  * the REPLACED chain (train on all, assign all, all-pairs within
  * cluster, min_by) built here from the same private helpers.
  */
class SemDedupCollapseSpec extends SparkSpec {

  test("q_semdedup on a duplicate-vector feed equals the uncollapsed chain") {
    val dir = "/tmp/semdedup_collapse_spec"
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    (0 to 2).map(k => base.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SimilarityQueries.qSemDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // the replaced chain, verbatim: assign EVERY vector to the trained
    // centroids, all pairs within a cluster, keeper = min_by partner
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .select("vec_id", "v", "norm")
    val assigned = SimilarityQueries
      .ivfAssign(e, SimilarityQueries.ivfCentroids(e, SimilarityQueries.IvfIters))
      .persist()
    val want = assigned.as("a").join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.cid").as("cid"), col("b.vec_id").as("vec_id"),
        col("a.vec_id").as("vec_a"),
        round(dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 5)
          .as("cosine"))
      .filter(col("cosine") >= 0.35)
      .groupBy(col("cid"), col("vec_id"))
      .agg(min_by(struct(col("vec_a"), col("cosine")), col("vec_a")).as("d"))
      .select(col("cid"), col("vec_id"), col("d.vec_a").as("dup_of"),
        col("d.cosine").as("cosine"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assigned.unpersist()

    assert(want.nonEmpty, "reference chain found no near-duplicates")
    // every replica beyond the original must be dropped, so the result
    // is at least 2x the corpus — the collapse path is genuinely hot here
    assert(got.size >= 2 * base.count(),
      s"duplicate replicas not all resolved: ${got.size}")
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty && extra.isEmpty,
      s"collapse diverges: missing=${missing.take(5)} extra=${extra.take(5)}")
  }
}
