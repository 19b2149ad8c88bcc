package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the signature-grain group resolution (round 11): on a feed where
  * the SAME documents recur under many doc_ids — the 100× rehearsal
  * shape whose raw pair graph k²-explodes (27M edges, SURVEY §10.16) —
  * the collapsed q_dedup_components / q_dedup_cluster_stats must produce
  * EXACTLY what CC over the full doc-grain pair graph produces.
  *
  * The spec replicates the sf0.001 documents ×3 under offset ids into a
  * temp dir, runs the production queries against it, and compares with
  * the REPLACED chain: ConnectedComponents over the full qDedupSimhash
  * pair set (within-group pairs included).
  */
class ComponentsCollapseSpec extends SparkSpec {

  private val dir = "/tmp/components_collapse_spec"

  private def writeCorpus(): Unit = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (0 to 2).map(k => base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q_dedup_components on a duplicate-heavy feed equals raw-graph CC") {
    writeCorpus()
    val got = SketchDedupQueries.qDedupComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // the replaced chain: CC over the FULL pair set at doc grain
    val want = graft.ops.ConnectedComponents
      .components(SketchDedupQueries.qDedupSimhash(spark, dir)
        .select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == want)
    assert(got.nonEmpty, "replicated corpus must form dup groups")
    graft.CacheScope.drain(spark)
  }

  test("q_dedup_cluster_stats sizes equal doc-grain component sizes") {
    writeCorpus()
    val got = SketchDedupQueries.qDedupClusterStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val comp = graft.ops.ConnectedComponents
      .components(SketchDedupQueries.qDedupSimhash(spark, dir)
        .select(col("doc_a"), col("doc_b")))
      .persist()
    val hist = comp.groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val inGraph = comp.count()
    val want = hist.collect().map { r =>
      val size = r.getLong(0); val n = r.getLong(1)
      (size, n, (size - 1) * n, nDocs - inGraph)
    }.toSet
    comp.unpersist()

    assert(got == want)
    assert(got.nonEmpty)
    graft.CacheScope.drain(spark)
  }

  test("dedupGroupBundle frames equal the standalone trio") {
    writeCorpus()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    val standalone = Map(
      "components" -> rows(SketchDedupQueries.qDedupComponents(spark, dir)),
      "apply" -> rows(SketchDedupQueries.qDedupApply(spark, dir)),
      "cluster_stats" -> rows(SketchDedupQueries.qDedupClusterStats(spark, dir)))
    graft.CacheScope.drain(spark)

    val bundle = SketchDedupQueries.dedupGroupBundle(spark, dir)
    standalone.foreach { case (name, want) =>
      assert(rows(bundle(name)) == want, s"bundle '$name' diverged")
      assert(want.nonEmpty)
    }
    graft.CacheScope.drain(spark)
  }
}
