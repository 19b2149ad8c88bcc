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

  test("decodeMeta closes the decoder exactly once per task") {
    CountingDecoder.reset()
    val df = Multimodal.withPayload(docs).repartition(3)
    Multimodal.decodeMeta(df, new CountingDecoder).collect()
    // local[n]: tasks share the JVM, so the static counters see all
    // partitions; every open() must be paired with a close()
    assert(CountingDecoder.opens.get() == 3)
    assert(CountingDecoder.closes.get() == 3)
  }

  test("resize preserves aspect within the target box") {
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs))
    val r = Multimodal.withResize(meta, maxSide = 100).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("resized_width"), x.getAs[Int]("resized_height")))).toMap
    r.values.foreach { case (w, h) => assert(w <= 100 && h <= 100 && w > 0 && h > 0) }
    // doc 1: 11 bytes -> 75 x 141 -> scaled by 100/141
    assert(r(1L) == ((75 * 100 / 141, 100)))
  }

  test("byte-histogram features are a real normalized distribution and feed cosine") {
    val feats = Multimodal.byteHistogramFeatures(
      Multimodal.withPayload(docs.filter(col("doc_id") =!= 3)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Double](r.fieldIndex("features"))).toMap
    feats.values.foreach { h =>
      assert(h.length == 16)
      assert(math.abs(h.sum - 1.0) < 1e-9) // normalized
    }
    // 'x'*600: every byte = 'x' (0x78) -> bin 7 holds all mass
    assert(feats(2L)(7) == 1.0)
    // cosine between the two docs' features is computable via DotProduct
    import graft.functions.VectorExprs.dot
    val fdf = Multimodal.byteHistogramFeatures(
      Multimodal.withPayload(docs.filter(col("doc_id") =!= 3)))
    val cos = fdf.as("a").join(fdf.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select((dot(col("a.features"), col("b.features")) /
        (sqrt(dot(col("a.features"), col("a.features"))) *
          sqrt(dot(col("b.features"), col("b.features"))))).as("c"))
      .collect()(0).getDouble(0)
    assert(cos >= 0.0 && cos <= 1.0)
  }

  test("frame sampling explodes deterministic indexes") {
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(
      Seq((9L, "y" * 25000)).toDF("doc_id", "text"))) // frames = 3
    val idx = Multimodal.sampleFrameIndexes(meta, everyK = 2)
      .collect().map(_.getAs[Int]("frame_idx")).sorted
    assert(idx.toSeq == Seq(0, 2))
  }
}

/** Decoder whose lifecycle is observable via JVM-wide counters (valid in
  * local mode: executor tasks share this JVM).
  */
object CountingDecoder {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0) }
}

class CountingDecoder extends Multimodal.StubDecoder {
  override def open(): Unit = CountingDecoder.opens.incrementAndGet()
  override def close(): Unit = CountingDecoder.closes.incrementAndGet()
}
