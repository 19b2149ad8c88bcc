package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.documents

/** The incremental verify join broadcasts the batch side WITH its
  * verify payload — sound only under the "daily batch" contract. This
  * spec makes the contract structural: a batch whose payload-carrying
  * band rows estimate past the ceiling fails fast with a pointer to the
  * whole-corpus path (instead of OOMing the driver mid-broadcast), a
  * normal daily shape passes the DEFAULT ceiling with wide margin, and
  * the id-based entry point reports O(batch) — not O(index) — bytes to
  * the guard (basic stats put a semi-join at its left side's size, so
  * an unmaterialized batch side would spuriously trip on every daily
  * batch against a big index).
  */
class IncrementalDedupGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val prop = "graft.inc.broadcast.max.bytes"

  test("a batch past the broadcast ceiling fails fast with the fix") {
    val docs = documents(spark, sf)
    val sigs = IncrementalDedupQueries.signatures(docs)
    sys.props(prop) = "1"
    try {
      val e = intercept[IllegalStateException] {
        IncrementalDedupQueries.pairsForBatchSigs(sigs, sigs)
      }
      assert(e.getMessage.contains("SketchDedupQueries"))
      assert(e.getMessage.contains(prop))
    } finally sys.props.remove(prop)
  }

  test("the sf0.001 daily shape passes the DEFAULT ceiling with margin") {
    // same construction as the gated q_dedup_incremental: standing index
    // on disk, one day's batch of signatures
    val docs = documents(spark, sf)
    val batchSigs = IncrementalDedupQueries
      .signatures(docs.filter(col("doc_id") % 5 === 4))
    // the guard path itself must not throw on the daily shape
    val pairs = IncrementalDedupQueries.pairsForBatchSigs(
      IncrementalDedupQueries.signatures(docs), batchSigs)
    assert(pairs.columns.toSeq ==
      Seq("doc_a", "doc_b", "minhash_est", "jaccard"))
    pairs.count() // executes the broadcast for real
  }

  test("id-based entry refuses a corpus-sized id list with nothing left cached") {
    val docs = documents(spark, sf)
    val lake = java.nio.file.Files.createTempDirectory("inc-preguard")
      .resolve("sig").toString
    IncrementalDedupQueries.updateIndex(
      spark, IncrementalDedupQueries.signatures(docs), lake)
    val index = spark.read.parquet(lake)
    sys.props(prop) = "1"
    try {
      val before = spark.sparkContext.getPersistentRDDs.size
      val e = intercept[IllegalStateException] {
        IncrementalDedupQueries.pairsAgainstIndex(
          index, index.select(col("doc_id")))
      }
      assert(e.getMessage.contains("SketchDedupQueries"))
      // the refusal must come from the metadata pre-guard, before the
      // batch SIGNATURE rows were persisted, and the ids-only probe
      // cache (which feeds both the guard count and the semi-join, so
      // batchIds evaluates once) must be released on the refusal path —
      // nothing left in the cache
      assert(spark.sparkContext.getPersistentRDDs.size == before,
        "refusal left batch-scale storage cached")
    } finally {
      sys.props.remove(prop)
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(lake).getParent)
    }
  }

  test("id-based entry reports O(batch) bytes, not O(index)") {
    val docs = documents(spark, sf)
    val lake = java.nio.file.Files.createTempDirectory("inc-guard")
      .resolve("sig").toString
    IncrementalDedupQueries.updateIndex(
      spark, IncrementalDedupQueries.signatures(docs), lake)
    val index = spark.read.parquet(lake)
    val indexBytes = new java.io.File(lake).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // a ceiling that an O(index) estimate would blow (the guard compares
    // post-explode bytes, so a buggy index-sized estimate reads as
    // ~4x indexBytes) but a 3-doc batch clears with margin
    assert(indexBytes > 64L * 1024,
      s"fixture too small to discriminate: index only $indexBytes bytes")
    val ceiling = 2L * indexBytes
    sys.props(prop) = ceiling.toString
    try {
      val tiny = index.select(col("doc_id")).limit(3)
      val pairs = IncrementalDedupQueries.pairsAgainstIndex(index, tiny)
      pairs.count()
    } finally {
      sys.props.remove(prop)
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(lake).getParent)
    }
  }
}
