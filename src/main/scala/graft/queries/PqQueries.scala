package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Product quantization (PQ) over the embeddings table — the memory-
  * compression half of large-scale ANN (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a 64-dim
  * vector becomes M=8 one-byte codes (one per 8-dim subspace, K=16
  * codewords each), a 64× compression that lets 100 TB of vectors fit a
  * cluster's RAM; queries then rank candidates with ASYMMETRIC distance
  * (exact query subvector vs quantized corpus codeword) without ever
  * touching the original vectors.
  *
  * Scale shape: the codebook is tiny (M×K subvectors — here the
  * deterministic vec_id<K sample per subspace; a trained deployment
  * refines it with the same decimal-Lloyd recipe as the IVF centroids)
  * and BROADCASTS everywhere. Encoding explodes each vector into M
  * subvector rows, joins the broadcast codebook, and collapses with a
  * map-side min_by — the shuffle carries M rows per vector, never the
  * M×K crossed frame (the same aggregation shape the IVF assignment
  * uses). ADC search precomputes a per-query lookup table (M×K distance
  * entries — broadcast), joins it to the exploded codes by (subspace,
  * code), and sums per candidate: a linear scan over CODES, the PQ
  * trade: cheap per-candidate work in exchange for approximation.
  *
  * Determinism: per-subspace distances come from the codegen'd
  * [[graft.functions.L2Squared]] kernel (sequential summation — bit-
  * identical to the oracle's unrolled left-associative SQL sum), rounded
  * to 5 decimals before any argmin/sum; cross-candidate sums route
  * through DECIMAL(18,5) so shuffle order can't move them.
  */
object PqQueries {

  import graft.functions.VectorExprs.l2sq

  private val M = 8        // subspaces
  private val SubDim = 8   // dims per subspace (M * SubDim = 64)
  private val K = 16       // codewords per subspace

  /** (vec_id, m, s): the vector split into M SubDim-dim subvectors. */
  private def subspaced(df: DataFrame): DataFrame =
    df.select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, slice(v, m*$SubDim+1, $SubDim) AS s))"))
      .as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.s").as("s"))

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))

  /** (m, k, cw): deterministic sample codebook. */
  private def codebook(e: DataFrame): DataFrame =
    subspaced(e.filter(col("vec_id") < K))
      .select(col("m"), col("vec_id").cast("int").as("k"), col("s").as("cw"))

  /** (vec_id, m, code, dmin): per-subspace nearest-codeword assignment,
    * collapsed map-side before the shuffle.
    */
  private def encoded(e: DataFrame): DataFrame = {
    val cb = codebook(e)
    subspaced(e).join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("k"),
        round(l2sq(col("s"), col("cw")), 5).as("d"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(struct(col("k"), col("d")), struct(col("d"), col("k"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.k").as("code"), col("best.d").as("dmin"))
  }

  /** PQ codes + quantization error per vector. Codes serialize as a
    * dash-joined string (array columns don't survive the row-sorting
    * oracle compare).
    */
  def qEmbedPq(spark: SparkSession, dir: String): DataFrame =
    encoded(vectors(spark, dir))
      .groupBy(col("vec_id"))
      .agg(
        concat_ws("-", expr(
          "transform(array_sort(collect_list(struct(m, code))), s -> CAST(s.code AS STRING))"))
          .as("codes"),
        round(sum(expr("CAST(dmin AS DECIMAL(18,5))")).cast("double"), 5)
          .as("qerr"))
      .orderBy(col("vec_id"))

  /** ADC top-3: sum the per-subspace query→codeword distances along each
    * candidate's codes; never touches corpus vectors after encode.
    */
  def qSimPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    val cb = codebook(e)
    val lut = subspaced(e.filter(col("vec_id") % 400 === 0))
      .select(col("vec_id").as("query_id"), col("m"), col("s"))
      .join(broadcast(cb), "m")
      .select(col("query_id"), col("m"), col("k"),
        round(l2sq(col("s"), col("cw")), 5).as("d"))
    encoded(e).as("c")
      .join(broadcast(lut).as("q"),
        col("c.m") === col("q.m") && col("c.code") === col("q.k"))
      .filter(col("q.query_id") =!= col("c.vec_id"))
      .groupBy(col("q.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .agg(round(sum(expr("CAST(d AS DECIMAL(18,5))")).cast("double"), 5)
        .as("adist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("adist"))
      .orderBy(col("query_id"), col("adist"), col("neighbor_id"))
  }

  /** IVF-PQ: the FAISS IVFPQ architecture — a coarse quantizer prunes the
    * candidate set to the query's `nprobe` inverted lists, and PQ codes
    * provide the in-list distances. The two halves already exist
    * standalone (q_sim_ivf, q_sim_pq_topk); composed, search cost becomes
    * (corpus/lists × nprobe) LUT lookups instead of a full scan, and
    * memory per candidate is M bytes instead of the vector — the layout
    * that serves billion-vector indexes. The coarse quantizer is the
    * TRAINED one — the same `iters`-round decimal-Lloyd centroids and
    * map-side max_by assignment as q_sim_ivf
    * ([[SimilarityQueries.ivfCentroids]]/[[SimilarityQueries.ivfAssign]]);
    * everything broadcast is bounded (centroids, probe table, per-query
    * LUT), and the candidate join is equi-join-only:
    * codes ⋈ lists ⋈ probes ⋈ LUT, no crossed frames.
    */
  private val IvfPqNprobe = 2

  def qSimIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dot
    val e0 = vectors(spark, dir)
    val e = e0.withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("norm"))
    val coarse = SimilarityQueries.ivfCentroids(e, SimilarityQueries.IvfIters)
    // index side: trained top-1 list per vector (map-side max_by collapse)
    val assigned = SimilarityQueries.ivfAssign(e, coarse)
      .select(col("vec_id"), col("cid"))
    // query side: the nprobe highest-cosine lists, explicit comparator so
    // the ordering (ccos DESC, cid ASC, NaN-first) matches the oracle
    val probes = e.filter(col("vec_id") % 400 === 0).as("a")
      .join(broadcast(coarse).as("b"), lit(true))
      .select(col("a.vec_id").as("query_id"), col("b.cid").as("cid"),
        round(dot(col("a.v"), col("b.cv")) / (col("a.norm") * col("b.cnorm")), 5)
          .as("ccos"))
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("ccos"), col("cid"))).as("cands"))
      .select(col("query_id"), explode(expr(
        s"""transform(slice(array_sort(cands, (l, r) -> CASE
           |  WHEN isnan(l.ccos) AND NOT isnan(r.ccos) THEN -1
           |  WHEN isnan(r.ccos) AND NOT isnan(l.ccos) THEN 1
           |  WHEN l.ccos > r.ccos THEN -1 WHEN l.ccos < r.ccos THEN 1
           |  WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1
           |  ELSE 0 END), 1, $IvfPqNprobe), c -> c.cid)""".stripMargin)).as("pcid"))
    val cb = codebook(e0)
    val lut = subspaced(e0.filter(col("vec_id") % 400 === 0))
      .select(col("vec_id").as("query_id"), col("m"), col("s"))
      .join(broadcast(cb), "m")
      .select(col("query_id").as("lq"), col("m").as("lm"), col("k"),
        round(l2sq(col("s"), col("cw")), 5).as("d"))
    encoded(e0).as("c")
      .join(assigned.as("al"), "vec_id")
      .join(broadcast(probes).as("p"), col("cid") === col("pcid"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(lut),
        col("query_id") === col("lq") && col("m") === col("lm") &&
          col("code") === col("k"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(max(col("cid")).as("list_id"),
        round(sum(expr("CAST(d AS DECIMAL(18,5))")).cast("double"), 5).as("adist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("list_id"), col("neighbor_id"), col("adist"))
      .orderBy(col("query_id"), col("adist"), col("neighbor_id"))
  }

  private def unrolledL2(a: String, b: String): String =
    (1 to SubDim).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  /** The PQ encode chain (sub/cb/d/best) WITHOUT the leading `e` CTE, so
    * it composes after any prefix that already defines `e` — the trained
    * IVF oracle reuses it on top of SimilarityQueries.trainedAssignCtes.
    */
  private val pqChainCtes: String =
    s"""sub AS (
      |  SELECT vec_id, m, v[m*$SubDim+1 : m*$SubDim+$SubDim] AS s
      |  FROM e, (SELECT unnest(generate_series(0, ${M - 1})) AS m) ms
      |), cb AS (
      |  SELECT m, CAST(vec_id AS INT) AS k, s AS cw FROM sub WHERE vec_id < $K
      |), d AS (
      |  SELECT sub.vec_id, sub.m, cb.k,
      |         round(${unrolledL2("sub.s", "cb.cw")}, 5) AS d
      |  FROM sub JOIN cb ON sub.m = cb.m
      |), best AS (
      |  SELECT vec_id, m, k AS code, d AS dmin,
      |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
      |  FROM d
      |)""".stripMargin

  private val commonCtes: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), $pqChainCtes""".stripMargin

  val qEmbedPqOracle: String =
    s"""$commonCtes
      |SELECT vec_id,
      |       string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS codes,
      |       round(CAST(sum(CAST(dmin AS DECIMAL(18,5))) AS DOUBLE), 5) AS qerr
      |FROM best WHERE rn = 1
      |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  val qSimPqTopkOracle: String =
    s"""$commonCtes, lut AS (
      |  SELECT sub.vec_id AS query_id, sub.m, cb.k,
      |         round(${unrolledL2("sub.s", "cb.cw")}, 5) AS d
      |  FROM sub JOIN cb ON sub.m = cb.m
      |  WHERE sub.vec_id % 400 = 0
      |), ad AS (
      |  SELECT l.query_id, b.vec_id AS neighbor_id,
      |         round(CAST(sum(CAST(l.d AS DECIMAL(18,5))) AS DOUBLE), 5) AS adist
      |  FROM (SELECT vec_id, m, code FROM best WHERE rn = 1) b
      |  JOIN lut l ON b.m = l.m AND b.code = l.k
      |  WHERE b.vec_id <> l.query_id
      |  GROUP BY 1, 2
      |)
      |SELECT query_id, neighbor_id, adist FROM ad
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) <= 3
      |ORDER BY query_id, adist, neighbor_id""".stripMargin

  /** Trained-coarse-quantizer oracle: SimilarityQueries.trainedAssignCtes
    * replays the decimal-Lloyd training bit-for-bit (ending in `e`,
    * `c<iters>`, and the index `assigned`), then the PQ chain and the
    * probe/LUT/ADC pipeline run on top.
    */
  val qSimIvfPqOracle: String =
    s"""${SimilarityQueries.trainedAssignCtes}, $pqChainCtes, probes AS (
      |  SELECT vec_id AS query_id, cid FROM (
      |    SELECT a.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY a.vec_id
      |             ORDER BY round(list_cosine_similarity(a.v, c.cv), 5) DESC, c.cid) AS prank
      |    FROM e a CROSS JOIN c${SimilarityQueries.IvfIters} c
      |    WHERE a.vec_id % 400 = 0)
      |  WHERE prank <= $IvfPqNprobe
      |), lut AS (
      |  SELECT sub.vec_id AS query_id, sub.m, cb.k,
      |         round(${unrolledL2("sub.s", "cb.cw")}, 5) AS d
      |  FROM sub JOIN cb ON sub.m = cb.m
      |  WHERE sub.vec_id % 400 = 0
      |), cand AS (
      |  SELECT p.query_id, b.vec_id AS neighbor_id, a2.cid AS list_id, l.d
      |  FROM (SELECT vec_id, m, code FROM best WHERE rn = 1) b
      |  JOIN assigned a2 ON b.vec_id = a2.vec_id
      |  JOIN probes p ON a2.cid = p.cid
      |  JOIN lut l ON l.query_id = p.query_id AND l.m = b.m AND l.k = b.code
      |  WHERE b.vec_id <> p.query_id
      |), ad AS (
      |  SELECT query_id, neighbor_id, max(list_id) AS list_id,
      |         round(CAST(sum(CAST(d AS DECIMAL(18,5))) AS DOUBLE), 5) AS adist
      |  FROM cand GROUP BY 1, 2
      |)
      |SELECT query_id, list_id, neighbor_id, adist FROM ad
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) <= 3
      |ORDER BY query_id, adist, neighbor_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pq" -> (qEmbedPq _),
    "q_sim_pq_topk" -> (qSimPqTopk _),
    "q_sim_ivfpq" -> (qSimIvfPq _))

  def oracles: Map[String, String] = Map(
    "q_embed_pq" -> qEmbedPqOracle,
    "q_sim_pq_topk" -> qSimPqTopkOracle,
    "q_sim_ivfpq" -> qSimIvfPqOracle)
}
