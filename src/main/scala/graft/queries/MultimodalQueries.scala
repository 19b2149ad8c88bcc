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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _))

  def oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaOracle)
}
