package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operations for training-data pipelines.
  *
  * Media travels as an opaque `binary` column plus typed metadata; decode /
  * feature-extraction runs as a per-partition batch operation (the Scala
  * analog of a pandas-batch UDF): one decoder instantiation per partition,
  * rows streamed through it — the shape that amortizes model/codec setup
  * at 100 TB. The actual byte decoding is a STUB (no image/audio libs in
  * this environment): `StubDecoder` derives deterministic fake
  * width/height/frames from the payload; swap in a real codec by
  * implementing `MediaDecoder`.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int)

  /** A per-partition decoder. `open()` is called once per partition (codec
    * or model warm-up), then `decode` per payload.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): (Int, Int, Int) // width, height, frames
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a real codec — derives dimensions from the
    * payload bytes. Replace with a JNI/Java codec for production.
    */
  class StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (64 + n % 512, 64 + (n * 7) % 512, 1 + n / 10000)
    }
  }

  /** Attaches an opaque binary payload column derived from text (for
    * pipelines whose fixtures have no real media, e.g. the documents
    * table); production sources read real bytes into the same shape.
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit("text/plain"))

  /** Decode pass: per-partition batched, decoder opened once per
    * partition. Input needs (doc_id, media_type, payload).
    */
  def decodeMeta(
      df: DataFrame,
      decoder: MediaDecoder = new StubDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        decoder.open()
        // release codec/model resources when the task finishes (normally
        // or on failure) — the iterator itself can't know when it's done
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
        rows.map { case (id, mt, payload) =>
          val (w, h, fr) = decoder.decode(payload)
          MediaMeta(id, mt, payload.length.toLong, w, h, fr)
        }
      }
  }

  /** Deterministic frame sampling for video-like payloads: pick every
    * k-th frame index up to `frames` — pure plan-side arithmetic.
    */
  def sampleFrameIndexes(meta: Dataset[MediaMeta], everyK: Int): DataFrame =
    meta.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("frames") - 1, lit(everyK))))
      .select(col("doc_id"), col("frame_idx"))

  /** Resize metadata: target box with aspect preserved — plan-side
    * integer arithmetic over the decoded dimensions.
    */
  def withResize(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    // clamp to >= 1: extreme aspect ratios would otherwise truncate a
    // scaled dimension to zero
    def scaled(c: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      greatest(lit(1),
        when(den <= maxSide, c)
          .otherwise((c * maxSide).cast("long") / den).cast("int"))
    meta.toDF()
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        scaled(col("width"), col("scale_den")).as("resized_width"),
        scaled(col("height"), col("scale_den")).as("resized_height"))
  }

  /** REAL feature extraction over the opaque payload (no stub): a
    * normalized 16-bin byte histogram per document, computed per
    * partition. The resulting `Array[Double]` plugs straight into the
    * similarity operators (cosine top-k / LSH / IVF) — the
    * media-to-embedding leg of a multimodal pipeline.
    */
  def byteHistogramFeatures(df: DataFrame, bins: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val hist = new Array[Double](bins)
        payload.foreach(b => hist((b & 0xff) * bins / 256) += 1.0)
        val n = math.max(1, payload.length)
        (id, hist.map(_ / n))
      })
      .toDF("doc_id", "features")
  }
}
