package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Similarity search over the embeddings table (`Array[Float]` column):
  * brute-force cosine top-k as the exact baseline, sign-LSH bucketed
  * variants as the scale path, and cosine near-dup pairs for dedup.
  *
  * Scale design: norms are precomputed once per row (narrow), so the
  * quadratic stage moves only (id, norm, vector); bucketing (sign-LSH)
  * turns the O(n²) cross join into per-bucket joins — the same plan shape
  * an IVF index gives. Cosines are computed with codegen'd higher-order
  * functions (zip_with + aggregate), not UDFs, and rounded to 5 decimals
  * so results are stable across engines/accumulation orders.
  */
object SimilarityQueries {

  import graft.functions.VectorExprs.dot

  /** vector as double + its L2 norm, from the float embedding column.
    * Norm and cosine use the codegen'd [[graft.functions.DotProduct]]
    * kernel (same left-to-right summation as the `aggregate` fold, so
    * results are bit-identical to the composable form — but the inner
    * loop is generated primitive code, not per-element lambdas).
    */
  private def withNorm(df: DataFrame): DataFrame = {
    val withV = df.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    withV
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .persist() // both sides of every pairwise join reuse the normed table
  }

  /** cosine between pre-normed sides a and b, rounded for determinism. */
  private def cosineExpr: Column = round(
    dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 5)

  // --- brute-force cosine top-k: exact baseline ---
  def qSimCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(spark, dir)).select("vec_id", "v", "norm")
    val q = e.filter(col("vec_id") % 400 === 0)
    q.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val qSimCosineTopkOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), sims AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(a.v, b.v), 5) AS cosine
      |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
      |  WHERE a.vec_id % 400 = 0
      |)
      |SELECT query_id, neighbor_id, cosine,
      |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      |FROM sims
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // --- embedding-cosine near-dup pairs, label-blocked ---
  // (blocking key = label; the dedup-by-similarity pass of a data pipeline)
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(spark, dir)).select("vec_id", "label", "v", "norm")
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.label").as("label"),
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        cosineExpr.as("cosine"))
      .filter(col("cosine") >= 0.3)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val qDedupEmbeddingOracle: String =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |)
      |SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       round(list_cosine_similarity(a.v, b.v), 5) AS cosine
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.v, b.v), 5) >= 0.3
      |ORDER BY 2, 3""".stripMargin

  // --- sign-LSH bucketed nearest neighbor: the approximate scale path ---
  // Bucket = sign bits of the first 8 dimensions (axis-aligned random
  // hyperplanes); candidate generation only within the bucket, so the
  // quadratic term shrinks by ~2^8 and the join shuffles on bucket.
  def qSimLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    val bucketExpr = expr(
      """aggregate(transform(sequence(1, 8),
        |  i -> CASE WHEN element_at(v, i) >= CAST(0.0 AS DOUBLE) THEN CAST(pow(2, i - 1) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
        |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
    val e = withNorm(embeddings(spark, dir))
      .withColumn("bucket", bucketExpr)
      .select("vec_id", "bucket", "v", "norm")
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.bucket").as("bucket"),
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") === 1)
      .drop("rank")
      .orderBy(col("vec_id"))
  }

  val qSimLshBucketedOracle: String =
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           i -> CASE WHEN embedding[i] >= 0 THEN 2 ** (i - 1) ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM embeddings
      |), sims AS (
      |  SELECT a.bucket AS bucket, a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(a.v, b.v), 5) AS cosine
      |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      |)
      |SELECT bucket, vec_id, neighbor_id, cosine FROM sims
      |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) = 1
      |ORDER BY vec_id""".stripMargin

  // --- IVF-style ANN: coarse quantizer + inverted lists ---
  // Coarse centroids are a deterministic sample (vec_id < 16 — IVF with
  // sampled centroids); every vector joins the inverted list of its
  // highest-cosine centroid (rounded, centroid-id tiebreak), and queries
  // search only their own list. At 100 TB the assignment pass is one
  // narrow broadcast join (16 centroids), and search cost drops by the
  // list count — same plan family as a trained IVF index, minus the
  // k-means iterations.
  def qSimIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(spark, dir)).select("vec_id", "v", "norm")
    val centroids = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val assigned = e.as("a")
      .join(broadcast(centroids).as("b"), lit(true))
      .select(col("a.vec_id").as("vec_id"), col("a.v").as("v"), col("a.norm").as("norm"),
        col("b.cid").as("cid"),
        round(dot(col("a.v"), col("b.cv")) / (col("a.norm") * col("b.cnorm")), 5).as("ccos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crank") === 1)
      .select("vec_id", "cid", "v", "norm")
      .persist()
    val queriesSet = assigned.filter(col("vec_id") % 400 === 0)
    queriesSet.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("a.cid").as("list_id"),
        col("b.vec_id").as("neighbor_id"),
        cosineExpr.as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "list_id", "neighbor_id", "cosine")
      .orderBy(col("query_id"), col("cosine").desc, col("neighbor_id"))
  }

  val qSimIvfOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
      |), assigned AS (
      |  SELECT vec_id, cid, v FROM (
      |    SELECT a.vec_id, c.cid, a.v,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY round(list_cosine_similarity(a.v, c.cv), 5) DESC, c.cid) AS crank
      |    FROM e a CROSS JOIN c
      |  ) WHERE crank = 1
      |), sims AS (
      |  SELECT a.vec_id AS query_id, a.cid AS list_id, b.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(a.v, b.v), 5) AS cosine
      |  FROM assigned a JOIN assigned b
      |    ON a.cid = b.cid AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id % 400 = 0
      |)
      |SELECT query_id, list_id, neighbor_id, cosine FROM sims
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= 3
      |ORDER BY query_id, cosine DESC, neighbor_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_cosine_topk" -> (qSimCosineTopk _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
    "q_sim_lsh_bucketed" -> (qSimLshBucketed _),
    "q_sim_ivf" -> (qSimIvf _))

  def oracles: Map[String, String] = Map(
    "q_sim_cosine_topk" -> qSimCosineTopkOracle,
    "q_dedup_embedding" -> qDedupEmbeddingOracle,
    "q_sim_lsh_bucketed" -> qSimLshBucketedOracle,
    "q_sim_ivf" -> qSimIvfOracle)
}
