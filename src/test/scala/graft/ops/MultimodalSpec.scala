package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, "x" * 600), (3L, "")).toDF("doc_id", "text")

  test("payload column is real binary with byte-accurate length") {
    val got = Multimodal.withPayload(docs)
      .select(col("doc_id"), octet_length(col("payload")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 11, 2L -> 600, 3L -> 0))
  }

  test("decodeMeta runs the per-partition decoder over every row") {
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta.keySet == Set(1L, 2L, 3L))
    assert(meta(1L).n_bytes == 11 && meta(1L).width == 64 + 11 % 512)
    assert(meta(2L).width == 64 + 600 % 512 && meta(2L).height == 64 + (600 * 7) % 512)
    assert(meta(3L).frames == 1)
    assert(meta.values.forall(_.media_type == "text/plain"))
  }

  test("frame sampling explodes deterministic indexes") {
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(
      Seq((9L, "y" * 25000)).toDF("doc_id", "text"))) // frames = 3
    val idx = Multimodal.sampleFrameIndexes(meta, everyK = 2)
      .collect().map(_.getAs[Int]("frame_idx")).sorted
    assert(idx.toSeq == Seq(0, 2))
  }
}
