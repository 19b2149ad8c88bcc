package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[graft.functions.CdcChunksExpr]] to the original
  * five-stage HOF derivation it replaced: same (doc_id, chunk) multiset
  * on real corpus text plus adversarial shapes (exactly 4 tokens — one
  * window; unicode tokens — md5 over UTF-8 bytes; repeated tokens).
  * The two derivations share only the boundary DEFINITION — md5, window
  * arithmetic, and chunk assembly are computed by disjoint code paths
  * (MessageDigest/manual rolling vs Catalyst md5/conv/transform), so
  * agreement here plus the DuckDB oracle gate is a three-way pin.
  */
class CdcExprSpec extends SparkSpec {

  import spark.implicits._

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("native CDC expression == HOF derivation on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = multiset(SketchDedupQueries.cdcChunks(docs))
    val hof = multiset(SketchDedupQueries.cdcChunksHof(docs))
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("native CDC expression == HOF derivation on edge shapes") {
    val docs = Seq(
      1L -> "alpha beta gamma delta", // exactly one window
      2L -> "héllo wörld ünïcode tokens über all",
      3L -> ("dup " * 40).trim, // every window identical
      4L -> (1 to 200).map(i => s"t$i").mkString(" "))
      .toDF("doc_id", "text")
    assert(multiset(SketchDedupQueries.cdcChunks(docs)) ==
      multiset(SketchDedupQueries.cdcChunksHof(docs)))
  }
}
