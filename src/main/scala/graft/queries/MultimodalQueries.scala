package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata derived alongside. The decode step itself
  * is a stub (see graft.ops.Multimodal — no image/audio libs in this
  * environment); everything Spark-side — binary schema, per-row metadata
  * extraction, deterministic derived dimensions — is real and verified.
  */
object MultimodalQueries {

  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8")) // the opaque binary column
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("text")).as("content_hash"),
        // deterministic stand-ins for decoded media dimensions (integer
        // arithmetic only; both engines agree on div/mod over ints)
        expr("64 + octet_length(payload) % 512").as("fake_width"),
        expr("64 + (octet_length(payload) * 7) % 512").as("fake_height"),
        expr("1 + (octet_length(payload) div 10000)").as("fake_frames"))
      .orderBy(col("doc_id"))

  val qMultimodalMetaOracle: String =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_hash,
      |       64 + octet_length(encode(text)) % 512 AS fake_width,
      |       64 + (octet_length(encode(text)) * 7) % 512 AS fake_height,
      |       1 + (octet_length(encode(text)) // 10000) AS fake_frames
      |FROM documents ORDER BY 1""".stripMargin

  // --- frame sampling + ViT patch-grid accounting ---
  // The pre-processing plan for video/image training data: uniformly
  // sample at most 8 frames per clip (stride = ceil(frames/8) — the
  // fan-out is CAPPED per row, the property that keeps the explode
  // linear at 100 TB no matter how long the longest video is), and for
  // each sampled frame compute the 16x16 ViT patch grid from the
  // decoded dimensions. Decode is the deterministic stub (same derived
  // dims as q_multimodal_meta); the sampling/patching arithmetic — the
  // part that IS Spark's job — is integer-exact in both engines.
  def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        expr("64 + octet_length(payload) % 512").as("w"),
        expr("64 + (octet_length(payload) * 7) % 512").as("h"),
        expr("1 + (octet_length(payload) div 40)").as("frames"))
      .withColumn("stride", expr("(frames + 7) div 8"))
      .select(col("doc_id"), col("w"), col("h"), col("frames"),
        explode(expr("sequence(0, frames - 1, stride)")).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        expr("(w + 15) div 16").as("patches_x"),
        expr("(h + 15) div 16").as("patches_y"),
        expr("((w + 15) div 16) * ((h + 15) div 16)").as("n_patches"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val qFrameSampleOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         64 + octet_length(encode(text)) % 512 AS w,
      |         64 + (octet_length(encode(text)) * 7) % 512 AS h,
      |         1 + (octet_length(encode(text)) // 40) AS frames
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, w, h,
      |         unnest(generate_series(0, frames - 1, (frames + 7) // 8)) AS frame_idx
      |  FROM m)
      |SELECT doc_id, frame_idx,
      |       (w + 15) // 16 AS patches_x,
      |       (h + 15) // 16 AS patches_y,
      |       ((w + 15) // 16) * ((h + 15) // 16) AS n_patches
      |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_frame_sample" -> (qFrameSample _))

  def oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaOracle,
    "q_frame_sample" -> qFrameSampleOracle)
}
