package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The property content-defined chunking exists for: an edit near the
  * start of a document re-chunks only its local neighborhood, because
  * boundary decisions depend on a 4-token window of CONTENT, not on
  * absolute positions. Fixed-stride chunking loses every downstream
  * block under the same one-token shift.
  */
class CdcChunkSpec extends SparkSpec {

  import spark.implicits._

  test("CDC chunks: a prefix insertion preserves all chunks after the first boundary") {
    val text = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === 1).select(col("text")).collect()(0).getString(0)
    val docs = Seq((1L, text), (2L, "zzzshift " + text)).toDF("doc_id", "text")
    val byDoc = SketchDedupQueries.cdcChunks(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val c1 = byDoc(1L)
    val c2 = byDoc(2L)
    assert(c1.size >= 3, s"fixture doc chunks too coarse: ${c1.size}")
    // multiset intersection
    val counts2 = c2.groupBy(identity).view.mapValues(_.size).toMap
    val shared = c1.groupBy(identity).map { case (c, xs) =>
      math.min(xs.size, counts2.getOrElse(c, 0))
    }.sum
    assert(shared >= c1.size - 1,
      s"CDC lost more than the edit-local chunk: $shared of ${c1.size} shared")

    // the fixed-stride strawman under the same shift: nothing survives
    val tk1 = text.trim.split("\\s+").toSeq
    val tk2 = ("zzzshift " + text).trim.split("\\s+").toSeq
    def stride(tk: Seq[String]) = tk.grouped(8).map(_.mkString(" ")).toSeq
    val s2 = stride(tk2).toSet
    val strideShared = stride(tk1).count(s2.contains)
    assert(strideShared == 0,
      s"stride chunking unexpectedly survived the shift: $strideShared")
  }
}
