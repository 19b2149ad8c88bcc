package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Training-data-pipeline operators beyond the dedup/similarity/text set:
  * temporal as-of join, deterministic sampling/splitting, TF-IDF term
  * scoring, embedding quantization, context-window sequence packing, and
  * benchmark decontamination.
  *
  * Scale design notes:
  *  - The as-of join is the union+window formulation: tag both sides,
  *    one shuffle on the join key, sort within key, carry the last
  *    right-side value forward (`last(..., ignoreNulls)` over an
  *    unbounded-preceding window). No range explosion, no per-row probe
  *    — the same single-shuffle shape a dedicated as-of operator gives.
  *  - Sampling/splitting hash on md5 of the stable id (portable integer
  *    arithmetic, reproducible by the DuckDB oracle bit-for-bit), so a
  *    sample is a pushdown-friendly filter, not a `TABLESAMPLE` whose
  *    result depends on partitioning.
  *  - TF-IDF's only non-equi join is a broadcast of the single-row
  *    corpus count (bounded, like the IVF centroid assignment).
  *  - Quantization is pure per-row array arithmetic (codegen'd
  *    higher-order functions, no UDFs).
  */
object PipelineQueries {

  // --- as-of join: purchase -> most recent prior-or-same-time click ---
  // The attribution pass of an event pipeline. Left = purchases, right =
  // clicks (deduped to one per (user, ms) for a deterministic match),
  // at-or-before semantics via side ordering at equal timestamps.
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("ms", unix_millis(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ms"), col("click_id"),
        lit(0).as("side"), lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), lit(null).cast("long").as("click_id"),
        lit(1).as("side"), col("event_id").as("purchase_id"))
    // one shuffle on user_id; within each user, clicks sort before
    // purchases at equal ms (side 0 < 1) so "at-or-before" includes ties
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ms",
        last(when(col("side") === 0, col("ms")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("asof_click_id").as("click_id"),
        (col("ms") - col("asof_click_ms")).as("lag_ms"))
      .orderBy(col("purchase_id"))
  }

  /** Oracle uses DuckDB's native ASOF JOIN — an independent implementation
    * of the same semantics, so agreement is meaningful.
    */
  val qAsofJoinOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), c AS (
      |  SELECT user_id, ms, max(event_id) AS click_id
      |  FROM e WHERE event_type = 'click' GROUP BY 1, 2
      |), p AS (
      |  SELECT user_id, ms, event_id AS purchase_id
      |  FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.purchase_id, p.user_id, c.click_id, p.ms - c.ms AS lag_ms
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms
      |ORDER BY 1""".stripMargin

  // --- deterministic stratified sampling ---
  // Per-stratum rates (the downsample-dominant-language pass of a corpus
  // pipeline): keep 50% of English, 20% of everything else, decided by a
  // portable hash of the doc id — re-running anywhere yields the same
  // sample, and the sample is a plain filter (column-pruned, pushdown
  // friendly), not a partitioning-dependent TABLESAMPLE.
  private val hashBucketSql =
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 10000"

  def qSampleStratified(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("bucket", expr(hashBucketSql))
      .filter(col("bucket") <
        when(col("lang") === "en", 5000L).otherwise(2000L))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  val qSampleStratifiedOracle: String =
    """SELECT doc_id, lang,
      |       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS bucket
      |FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000
      |      < CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END
      |ORDER BY 1""".stripMargin

  // --- class-balanced downsampling (cap every class at the smallest) ---
  // The complement of proportional stratified sampling: equalize
  // classes by capping each language at the SMALLEST language's count —
  // the balancing pass before training a classifier on skewed labels.
  // Which docs survive is deterministic (rank by salted portable md5,
  // ties by doc_id), so the oracle reproduces the exact kept set. The
  // per-class rank is a window partitioned by lang — each class ranks
  // in parallel, and the cap is a broadcast scalar, not a per-row
  // subquery.
  def qBalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("lang"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat('bal5:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"))
    val cap = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("cap"))
    d.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .crossJoin(broadcast(cap))
      .filter(col("rk") <= col("cap"))
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
      .orderBy(col("doc_id"))
  }

  val qBalancedSampleOracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |         CAST('0x' || substr(md5('bal5:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM documents),
      |cap AS (
      |  SELECT min(n) AS cap FROM (
      |    SELECT lang, count(*) AS n FROM d GROUP BY 1)),
      |r AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      |  FROM d)
      |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
      |FROM r CROSS JOIN cap WHERE rk <= cap
      |ORDER BY doc_id""".stripMargin

  // --- weighted sampling without replacement (Efraimidis-Spirakis) ---
  // Quality/length-weighted corpus subsampling: select k docs where
  // P(selection) tilts toward weight w (here n_chars — stand-in for any
  // quality score) via the A-ES one-pass reduction: key = ln(u)/w with
  // u ~ U(0,1], take the k LARGEST keys. Equivalent to sequential
  // weighted draws without replacement (Efraimidis & Spirakis 2006), but
  // expressed as a per-row scalar + top-k — no sequential state, so it
  // parallelizes over any partitioning and at 100 TB is a TakeOrdered
  // (per-partition top-k, then merge k*P rows on the driver), never a
  // global sort. u is a salted portable md5 of the doc id, so the sample
  // is reproducible in any engine; the key is one closed-form double
  // rounded to 9 (ties broken by doc_id).
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("u_i", expr(
        "cast(conv(substring(md5(concat('ws7:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 1000000000"))
      .withColumn("skey", round(expr("ln((u_i + 1) / 1000000000.0) / n_chars"), 9))
      .select(col("doc_id"), col("n_chars"), col("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(25)

  val qWeightedSampleOracle: String =
    """SELECT doc_id, n_chars,
      |       round(ln(((CAST('0x' || substr(md5('ws7:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      |                  % 1000000000) + 1) / 1000000000.0) / n_chars, 9) AS skey
      |FROM documents
      |ORDER BY skey DESC, doc_id
      |LIMIT 25""".stripMargin

  // --- deterministic train/test split ---
  // Salted hash split (salt isolates this split from the sampling hash
  // above — correlated splits leak). Reported as counts per (lang, split)
  // so the gate pins both the assignment and the stratification balance.
  def qTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat('split42:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 100"))
      .withColumn("split", when(col("h") < 90, "train").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))

  val qTrainTestSplitOracle: String =
    """WITH a AS (
      |  SELECT lang,
      |         CASE WHEN CAST('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
      |              THEN 'train' ELSE 'test' END AS split
      |  FROM documents
      |)
      |SELECT lang, split, count(*) AS n_docs
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- TF-IDF top terms per document ---
  // tf and df are two narrow aggregations over the token explosion; the
  // corpus size joins in as a broadcast single-row aggregate (bounded
  // cross join, same family as the IVF centroid broadcast). Scores are
  // rounded to 5 decimals so ln() agrees across engines.
  def qTfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .transform(graft.CacheScope.persist) // feeds df, the corpus count, and the score join
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    val nDocs = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("nd"))
    tf.join(dfreq, "tok")
      .join(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("dfreq")), 5))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("tok").as("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val qTfidfTopkOracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), tt AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM t WHERE tok <> '' GROUP BY 1, 2
      |), df AS (
      |  SELECT tok, count(*) AS dfreq FROM tt GROUP BY 1
      |), n AS (
      |  SELECT count(DISTINCT doc_id) AS nd FROM tt
      |), s AS (
      |  SELECT tt.doc_id, tt.tok,
      |         round(tf * ln(CAST(nd AS DOUBLE) / dfreq), 5) AS tfidf
      |  FROM tt JOIN df USING (tok) CROSS JOIN n
      |)
      |SELECT doc_id,
      |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INT) AS rank,
      |       tok AS term, tfidf
      |FROM s
      |QUALIFY rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // --- BM25 document ranking for a fixed query-term set ---
  // Okapi BM25 (k1 = 1.2, b = 0.75, Lucene's ln(1 + ...) idf) over the
  // whitespace-token corpus, top-10 docs for the query
  // {spark, window, merge}. Scale shape: the (doc, term) tf table is
  // FILTERED TO THE QUERY TERMS before any join — a 3-term query
  // touches 3 posting lists however wide the vocabulary — and the
  // corpus-level stats (N, avgdl, per-term df) are single-row /
  // 3-row broadcasts. Cross-engine determinism: each per-term partial
  // is rounded to integer MICRO-units and the doc score is a BIGINT sum
  // of those — double addition order across terms can never flip a
  // rank, the one thing `sum(double)` cannot guarantee across engines.
  def qBm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("spark", "window", "merge")
    val toksDf = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"), explode(col("tk")).as("tok"))
      .filter(col("tok") =!= "")
    val stats = toksDf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"))
    val tf = toksDf.filter(col("tok").isin(qterms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("dfq"))
    tf.join(broadcast(dfreq), "tok")
      .join(broadcast(stats))
      .withColumn("part_micro", expr(
        """CAST(round(1000000 * ln(1.0 + (nd - dfq + 0.5) / (dfq + 0.5)) *
          |  (tf * (1.2 + 1.0)) /
          |  (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
          |) AS BIGINT)""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(sum(col("part_micro")).as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(10)
  }

  val qBm25TopkOracle: String =
    """WITH t AS (
      |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS dl,
      |         unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), tnz AS (SELECT * FROM t WHERE tok <> ''
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM tnz)
      |), tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
      |  FROM tnz WHERE tok IN ('spark', 'window', 'merge') GROUP BY 1, 2
      |), df AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS dfq FROM tf GROUP BY 1
      |), p AS (
      |  SELECT tf.doc_id,
      |         CAST(round(1000000 * ln(1.0 + (nd - dfq + 0.5) / (dfq + 0.5)) *
      |           (tf * (1.2 + 1.0)) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
      |         ) AS BIGINT) AS part_micro
      |  FROM tf JOIN df USING (tok) CROSS JOIN stats
      |)
      |SELECT doc_id, CAST(sum(part_micro) AS BIGINT) AS score_micro,
      |       CAST(count(*) AS BIGINT) AS n_terms_hit
      |FROM p GROUP BY doc_id
      |ORDER BY score_micro DESC, doc_id
      |LIMIT 10""".stripMargin

  // --- reciprocal-rank fusion of two retrieval rankings ---
  // The standard hybrid-retrieval combiner (Cormack et al. 2009):
  // RRF(d) = Σ_r 1/(60 + rank_r(d)) over the input rankings — here
  // BM25 and TF-IDF for the same 3-term query, both derived from ONE
  // (doc, term) tf scan. Robust to score-scale mismatch because only
  // RANKS enter the fusion, which is also what makes it exactly
  // integer-expressible: contribution = 1000000 div (60 + rank) in
  // micro-units (integer division — zero doubles end to end; even the
  // per-ranking scores are BIGINT micro-units). A doc absent from a
  // ranking contributes nothing — the real RRF convention for
  // heterogeneous retrievers. Top-10 fused, ties by doc_id.
  /** Shared lexical-scoring core for q_rank_fusion and q_ndcg_eval:
    * per-doc BM25 and TF-IDF micro-unit scores (s1, s2) for the fixed
    * 3-term query, both derived from one (doc, term) tf scan.
    */
  private def lexicalScores(spark: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("spark", "window", "merge")
    val toksDf = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"), explode(col("tk")).as("tok"))
      .filter(col("tok") =!= "")
    val stats = toksDf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"))
    val tf = toksDf.filter(col("tok").isin(qterms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .transform(graft.CacheScope.persist)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("dfq"))
    val scored = tf.join(broadcast(dfreq), "tok").join(broadcast(stats))
      .withColumn("bm25_micro", expr(
        """CAST(round(1000000 * ln(1.0 + (nd - dfq + 0.5) / (dfq + 0.5)) *
          |  (tf * (1.2 + 1.0)) /
          |  (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
          |) AS BIGINT)""".stripMargin))
      .withColumn("tfidf_micro", expr(
        "CAST(round(1000000 * tf * ln(CAST(nd AS DOUBLE) / dfq)) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bm25_micro")).as("s1"), sum(col("tfidf_micro")).as("s2"))
    scored
  }

  def qRankFusion(spark: SparkSession, dir: String): DataFrame =
    lexicalScores(spark, dir)
      .withColumn("rank_bm25", row_number().over(
        Window.orderBy(col("s1").desc, col("doc_id"))))
      .withColumn("rank_tfidf", row_number().over(
        Window.orderBy(col("s2").desc, col("doc_id"))))
      .withColumn("rrf_micro",
        expr("1000000 div (60 + rank_bm25) + 1000000 div (60 + rank_tfidf)"))
      .select(col("doc_id"), col("rank_bm25").cast("long").as("rank_bm25"),
        col("rank_tfidf").cast("long").as("rank_tfidf"), col("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(10)

  // --- nDCG@10 retrieval evaluation ---
  // The ranking-quality gate a hybrid-retrieval pipeline runs: score
  // the BM25 ranking against graded relevance derived from the TF-IDF
  // ideal (rel = 11 - tfidf_rank for the truth's top-10, else 0).
  // The log2 discounts exist only at ranks 1..10, so they are inlined
  // as a 10-row INTEGER ppm literal table computed once at plan build —
  // the same constants in the Spark plan and the oracle SQL — and the
  // whole metric is integer arithmetic: dcg_u = sum(rel * disc_ppm),
  // ndcg_ppm = 1e6 * dcg div idcg. No runtime transcendental ever
  // crosses an engine boundary.
  private val NdcgDisc: Seq[(Int, Long)] = (1 to 10).map(i =>
    i -> math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  def qNdcgEval(spark: SparkSession, dir: String): DataFrame = {
    // only the two top-10s matter, so ranks come from orderBy + limit
    // (TakeOrderedAndProject: per-partition top-10 + driver merge) and
    // the row_number windows run over 10-row frames — never a global
    // rank of every matched document (at web scale the matched set is
    // huge; the 10x probe caught the full-rank window at 6.7x cost)
    val scored = lexicalScores(spark, dir).localCheckpoint(true)
    def top10(scoreCol: String, rankName: String): DataFrame =
      scored.orderBy(col(scoreCol).desc, col("doc_id")).limit(10)
        .withColumn(rankName, row_number().over(
          Window.orderBy(col(scoreCol).desc, col("doc_id"))))
        .select(col("doc_id"), col(rankName))
    val sys10 = top10("s1", "rank_bm25")
    val truth10 = top10("s2", "rank_tfidf")
    val discSql = NdcgDisc.map { case (i, d) => s"($i, ${d}L)" }.mkString(", ")
    val disc = spark.sql(
      s"SELECT * FROM VALUES $discSql AS t(rank, disc_ppm)")
    // rel(doc) = 11 - truth rank for the truth's top-10, else 0
    val dcg = sys10
      .join(truth10, Seq("doc_id"), "left")
      .withColumn("rel",
        greatest(lit(0L), lit(11L) - coalesce(col("rank_tfidf"), lit(11L))))
      .join(broadcast(disc), col("rank_bm25") === col("rank"))
      .agg(sum(col("rel") * col("disc_ppm")).as("dcg_u"))
    val idcg = truth10
      .withColumn("rel", lit(11L) - col("rank_tfidf"))
      .join(broadcast(disc), col("rank_tfidf") === col("rank"))
      .agg(sum(col("rel") * col("disc_ppm")).as("idcg_u"))
    val overlap = sys10.join(truth10, "doc_id")
      .agg(count(lit(1)).as("n_overlap"))
    dcg.crossJoin(idcg).crossJoin(overlap)
      .select(col("dcg_u"), col("idcg_u"), col("n_overlap"),
        expr("1000000 * dcg_u div idcg_u").as("ndcg_ppm"))
  }

  val qNdcgEvalOracle: String = {
    val discSql = NdcgDisc.map { case (i, d) => s"($i, $d)" }.mkString(", ")
    // the scored/ranked prefix mirrors qRankFusionOracle's CTE chain
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl,
       |         unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents
       |), tnz AS (SELECT * FROM t WHERE tok <> ''
       |), stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sdl
       |  FROM (SELECT DISTINCT doc_id, dl FROM tnz)
       |), tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM tnz WHERE tok IN ('spark', 'window', 'merge') GROUP BY 1, 2
       |), df AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS dfq FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id,
       |         CAST(sum(CAST(round(1000000 * ln(1.0 + (nd - dfq + 0.5) / (dfq + 0.5)) *
       |           (tf * (1.2 + 1.0)) /
       |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
       |         ) AS BIGINT)) AS BIGINT) AS s1,
       |         CAST(sum(CAST(round(1000000 * tf * ln(CAST(nd AS DOUBLE) / dfq)) AS BIGINT)) AS BIGINT) AS s2
       |  FROM tf JOIN df USING (tok) CROSS JOIN stats
       |  GROUP BY 1
       |), ranked AS (
       |  SELECT doc_id,
       |         row_number() OVER (ORDER BY s1 DESC, doc_id) AS rank_bm25,
       |         row_number() OVER (ORDER BY s2 DESC, doc_id) AS rank_tfidf
       |  FROM scored
       |), disc AS (SELECT * FROM (VALUES $discSql) d(rank, disc_ppm)
       |), rel AS (
       |  SELECT doc_id, rank_bm25, rank_tfidf,
       |         greatest(0, 11 - rank_tfidf) AS rel
       |  FROM ranked
       |), dcg AS (
       |  SELECT CAST(sum(rel * disc_ppm) AS BIGINT) AS dcg_u
       |  FROM rel JOIN disc ON rel.rank_bm25 = disc.rank
       |  WHERE rank_bm25 <= 10
       |), idcg AS (
       |  SELECT CAST(sum(rel * disc_ppm) AS BIGINT) AS idcg_u
       |  FROM rel JOIN disc ON rel.rank_tfidf = disc.rank
       |  WHERE rank_tfidf <= 10
       |), ov AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_overlap FROM rel
       |  WHERE rank_bm25 <= 10 AND rank_tfidf <= 10)
       |SELECT dcg_u, idcg_u, n_overlap,
       |       CAST(1000000 * dcg_u // idcg_u AS BIGINT) AS ndcg_ppm
       |FROM dcg CROSS JOIN idcg CROSS JOIN ov""".stripMargin
  }

  val qRankFusionOracle: String =
    """WITH t AS (
      |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS dl,
      |         unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), tnz AS (SELECT * FROM t WHERE tok <> ''
      |), stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM tnz)
      |), tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
      |  FROM tnz WHERE tok IN ('spark', 'window', 'merge') GROUP BY 1, 2
      |), df AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS dfq FROM tf GROUP BY 1
      |), scored AS (
      |  SELECT tf.doc_id,
      |         CAST(sum(CAST(round(1000000 * ln(1.0 + (nd - dfq + 0.5) / (dfq + 0.5)) *
      |           (tf * (1.2 + 1.0)) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
      |         ) AS BIGINT)) AS BIGINT) AS s1,
      |         CAST(sum(CAST(round(1000000 * tf * ln(CAST(nd AS DOUBLE) / dfq)) AS BIGINT)) AS BIGINT) AS s2
      |  FROM tf JOIN df USING (tok) CROSS JOIN stats
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY s1 DESC, doc_id) AS rank_bm25,
      |         row_number() OVER (ORDER BY s2 DESC, doc_id) AS rank_tfidf
      |  FROM scored)
      |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
      |       CAST(rank_tfidf AS BIGINT) AS rank_tfidf,
      |       CAST(1000000 // (60 + rank_bm25) + 1000000 // (60 + rank_tfidf) AS BIGINT)
      |         AS rrf_micro
      |FROM ranked
      |ORDER BY rrf_micro DESC, doc_id
      |LIMIT 10""".stripMargin

  // --- int8 symmetric embedding quantization ---
  // The vector-compression pass before ANN at scale (4 bytes -> 1 byte
  // per dim). scale = max|v| / 127 per vector; reported as checksums
  // (sum / L1 / max of the quantized codes) so the gate pins every code
  // without comparing raw arrays.
  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / CAST(127.0 AS DOUBLE)"))
      .withColumn("q", expr(
        """CASE WHEN scale = CAST(0.0 AS DOUBLE)
          |  THEN transform(v, x -> CAST(0 AS BIGINT))
          |  ELSE transform(v, x -> CAST(round(x / scale) AS BIGINT)) END""".stripMargin))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))").as("q_l1"),
        expr("array_max(q)").as("q_max"))
      .orderBy(col("vec_id"))

  val qEmbedQuantizeOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, v,
      |         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM e
      |), q AS (
      |  SELECT vec_id, scale,
      |         CASE WHEN scale = 0
      |           THEN list_transform(v, x -> CAST(0 AS BIGINT))
      |           ELSE list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) END AS qv
      |  FROM s
      |)
      |SELECT vec_id, round(scale, 6) AS scale_r,
      |       CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
      |       list_max(qv) AS q_max
      |FROM q ORDER BY 1""".stripMargin

  // --- sequence packing: fill fixed token budgets (context windows) ---
  // The pretraining packing pass: within each (lang, shard), documents
  // are laid out in stable doc_id order and cut into sequences of budget
  // 4096 tokens by the EXCLUSIVE running token count — a document starts
  // a new sequence when the budget is crossed (contiguous packing; a doc
  // may straddle its boundary, which real packers handle by splitting —
  // the assignment is what's computed here). The shard key (doc_id % 8)
  // is what makes this scale: packing is a window function, and sharding
  // bounds every sort partition instead of serializing per language.
  private val PackBudget = 4096

  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr(s"CAST((cum - n_tokens) DIV $PackBudget AS BIGINT)"))
      .groupBy(col("lang"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("shard"), col("seq_id"))
  }

  val qPackSequencesOracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, doc_id % 8 AS shard,
      |         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, lang, shard, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t
      |)
      |SELECT lang, shard, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS seq_id,
      |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --- split-aware sequence packing: exact-budget token spans ---
  // The refinement of qPackSequences a real packer ships: a document that
  // straddles a 4096-token boundary is SPLIT at the boundary, so every
  // sequence holds exactly PackBudget tokens (the terminal sequence of
  // each (lang, shard) stream may run short). Output is one row per
  // (doc, sequence) span with doc-local [token_start, token_end) offsets;
  // a doc spanning k boundaries explodes into k+1 rows — bounded by
  // n_tokens/4096 + 1, so the explode is linear in corpus tokens. Same
  // single window + narrow explode shape as qPackSequences: one shuffle
  // on (lang, shard), no global sort.
  def qPackSpans(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("strt", col("cum") - col("n_tokens")) // global offset of doc start
      // sequences the doc's token interval [strt, cum) overlaps
      .withColumn("seq_id", explode(expr(
        s"sequence(strt DIV $PackBudget, (cum - 1) DIV $PackBudget)")))
      .select(col("lang"), col("shard"), col("doc_id"), col("seq_id"),
        greatest(lit(0L), col("seq_id") * PackBudget - col("strt")).as("token_start"),
        least(col("n_tokens"), (col("seq_id") + 1) * PackBudget - col("strt")).as("token_end"))
      .orderBy(col("lang"), col("shard"), col("doc_id"), col("seq_id"))
  }

  val qPackSpansOracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, doc_id % 8 AS shard,
      |         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, lang, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM t
      |), s AS (
      |  SELECT lang, shard, doc_id, n_tokens, cum, cum - n_tokens AS strt,
      |         unnest(generate_series((cum - n_tokens) // $PackBudget, (cum - 1) // $PackBudget)) AS seq_id
      |  FROM c
      |)
      |SELECT lang, shard, doc_id, CAST(seq_id AS BIGINT) AS seq_id,
      |       CAST(greatest(0, seq_id * $PackBudget - strt) AS BIGINT) AS token_start,
      |       CAST(least(n_tokens, (seq_id + 1) * $PackBudget - strt) AS BIGINT) AS token_end
      |FROM s ORDER BY lang, shard, doc_id, seq_id""".stripMargin

  // --- deterministic epoch shuffle + sharding ---
  // The training-order pass: every epoch needs the corpus in a
  // different, REPRODUCIBLE pseudo-random order, split into shards
  // sized for one writer/reader each. Order comes from a salted md5 of
  // the doc id (salt = epoch tag, so epochs decorrelate and the order
  // never depends on input layout); the shard is the hash mod N, and
  // the in-shard position ranks the same hash — one hash-partitioned
  // shuffle plus a per-shard sort, exactly what `write.partitionBy
  // (shard) sortWithinPartitions(pos)` executes at 100 TB. N = 8 here;
  // a real run sizes N so each shard matches the target output file
  // size, which only widens the exchange, never changes the plan shape.
  private val ShuffleShards = 8
  private[queries] def shuffleShardCount: Int = ShuffleShards

  def qShuffleShard(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("skey", expr(
        "cast(conv(substring(md5(concat('epoch0:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"))
      .withColumn("shard", pmod(col("skey"), lit(ShuffleShards)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))

  val qShuffleShardOracle: String =
    s"""WITH a AS (
      |  SELECT doc_id,
      |         CAST('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS skey
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(skey % $ShuffleShards AS INT) AS shard,
      |       CAST(row_number() OVER (PARTITION BY skey % $ShuffleShards
      |                               ORDER BY skey, doc_id) AS INT) AS pos
      |FROM a ORDER BY shard, pos""".stripMargin

  // --- Z-order layout: multi-dimensional clustering for data skipping ---
  // The lakehouse layout pass (Delta OPTIMIZE ZORDER, Hudi/Iceberg sort
  // orders): queries filter events by USER and by DAY, but a file layout
  // sorted on one column leaves the other's per-file min/max spanning
  // the whole domain — no skipping. Interleaving the bits of both
  // dimensions onto a space-filling curve gives every file a tight
  // bounding BOX in (user, day) space, so either predicate prunes files.
  //
  // The z-value is pure codegen'd bit arithmetic (an unrolled 8-bit
  // interleave — identical in any engine); files are z-PREFIX ranges
  // (z >> 9), so the whole layout-stats pass is ONE map-side-combinable
  // groupBy — no global sort. A production writer materializes the same
  // assignment with repartitionByRange(z) + sortWithinPartitions(z),
  // a single range exchange at 100 TB; the emitted per-file min/max are
  // exactly the footer stats a reader prunes on.
  private def zInterleave(xb: String, yb: String): String =
    (0 until 8).map(i =>
      s"shiftleft(shiftright($xb, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($yb, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")

  def qZorderLayout(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("xb", (col("user_id") % 256).cast("int"))
      .withColumn("yb",
        (expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')") % 256).cast("int"))
      .withColumn("z", expr(zInterleave("xb", "yb")))
      .withColumn("z_file", expr("shiftright(z, 9)"))
      .groupBy(col("z_file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_user"), max(col("xb")).as("max_user"),
        min(col("yb")).as("min_day"), max(col("yb")).as("max_day"))
      .orderBy(col("z_file"))

  val qZorderLayoutOracle: String = {
    val z = (0 until 8).map(i =>
      s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH a AS (
      |  SELECT CAST(user_id % 256 AS INT) AS xb,
      |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 256 AS INT) AS yb
      |  FROM events
      |), zs AS (SELECT xb, yb, $z AS z FROM a)
      |SELECT z >> 9 AS z_file, count(*) AS n_rows,
      |       min(xb) AS min_user, max(xb) AS max_user,
      |       min(yb) AS min_day, max(yb) AS max_day
      |FROM zs GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- decontamination: test-set n-gram overlap detection ---
  // Distinct from dedup: an ASYMMETRIC cross-set check. Training docs
  // sharing many 3-gram shingles with any held-out benchmark doc are
  // contaminated and must be dropped before training. The benchmark side
  // here is a deterministic slice (doc_id % 97 == 0) standing in for an
  // external eval set; the join is shingle-keyed, counts are per
  // (train, benchmark) pair, and only pairs over the threshold surface.
  // The broadcast is sized for REAL eval suites (fixed, thousands of
  // docs — tiny next to a 100 TB corpus); a benchmark too big to
  // broadcast degrades gracefully to the same shuffle equi-join.
  private val ContamMinShared = 2

  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val shingled = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(graft.functions.ShinglesExpr.shingles(col("tk")))
        .as("shingle"))
    val bench = shingled.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("benchmark_doc_id"), col("shingle"))
    val train = shingled.filter(col("doc_id") % 97 =!= 0)
    train.join(broadcast(bench), "shingle")
      .groupBy(col("doc_id").as("train_doc_id"), col("benchmark_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContamMinShared)
      .orderBy(col("train_doc_id"), col("benchmark_doc_id"))
  }

  val qDecontaminateOracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
      |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
      |), s AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tk)-2),
      |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS shingle
      |  FROM d
      |)
      |SELECT t.doc_id AS train_doc_id, b.doc_id AS benchmark_doc_id,
      |       count(*) AS n_shared
      |FROM s t JOIN s b ON t.shingle = b.shingle
      |WHERE b.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
      |GROUP BY 1, 2
      |HAVING count(*) >= $ContamMinShared
      |ORDER BY 1, 2""".stripMargin

  // --- decontamination, skew-safe fallback: salted shuffle join ---
  // The documented fallback for when the benchmark side is too big to
  // broadcast (a mega eval suite, or decontaminating against another
  // corpus slice): the same shingle equi-join as qDecontaminate, but as a
  // salted shuffle join ([[graft.ops.SkewJoin]]). Shingle keys are
  // Zipfian — one hot phrase ("terms of service") can put a whole
  // reducer's worth of rows on one key — so the train side salts
  // 8 ways on a hash of its doc_id and the benchmark side replicates
  // across the salts: the hot key spreads over 8 tasks at the cost of an
  // 8x fan-out of the (bounded) benchmark side. Output is EXACTLY
  // qDecontaminate's — the gate runs both against the same oracle.
  def qDecontaminateSkew(spark: SparkSession, dir: String): DataFrame = {
    val shingled = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(graft.functions.ShinglesExpr.shingles(col("tk")))
        .as("shingle"))
    val bench = shingled.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("benchmark_doc_id"), col("shingle"))
    val train = shingled.filter(col("doc_id") % 97 =!= 0)
    graft.ops.SkewJoin
      .saltedInnerJoin(train, bench, key = "shingle", saltSource = "doc_id")
      .groupBy(col("doc_id").as("train_doc_id"), col("benchmark_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContamMinShared)
      .orderBy(col("train_doc_id"), col("benchmark_doc_id"))
  }

  // --- decontamination, Bloom semi-join reduction ---
  // The third strategy, for the same can't-broadcast scenario as the
  // salted join but attacking the SHUFFLE VOLUME instead of the skew: an
  // 8 KiB Bloom filter over the benchmark's shingles ([[graft.functions
  // .Bloom]]) broadcasts for free and drops almost every train shingle
  // BEFORE the corpus-wide shuffle — at 100 TB the exchange then carries
  // only near-matches, not the corpus. False positives survive the
  // pre-filter but are removed by the exact equi-join that follows, and
  // Bloom filters have no false negatives, so the composition is
  // result-identical to qDecontaminate: the gate runs all three
  // strategies against the SAME oracle.
  def qDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val shingled = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(graft.functions.ShinglesExpr.shingles(col("tk")))
        .as("shingle"))
    val bench = shingled.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("benchmark_doc_id"), col("shingle"))
    val train = shingled.filter(col("doc_id") % 97 =!= 0)
    val bloom = graft.functions.Bloom.build(bench, "shingle")
    val prefiltered = train
      .crossJoin(broadcast(bloom))
      .filter(graft.functions.Bloom.mightContain(col("shingle"), col("bloom_bits")))
      .drop("bloom_bits")
    // deliberately NOT broadcast: this strategy exists for when the
    // benchmark side can't broadcast, so the final exact check is a
    // shuffle equi-join — over the bloom survivors only
    prefiltered.join(bench.hint("shuffle_hash"), "shingle")
      .groupBy(col("doc_id").as("train_doc_id"), col("benchmark_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContamMinShared)
      .orderBy(col("train_doc_id"), col("benchmark_doc_id"))
  }

  // --- domain mixing weights ---
  // The mix-rebalancing pass: given a target UNIFORM mix across sources,
  // the per-source keep-rate is min_count / count (downsample every
  // source to the rarest one). The global window runs over the tiny
  // post-aggregation table (one row per source), not the data.
  def qMixWeights(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("keep_rate",
        round(min(col("n_docs")).over(Window.partitionBy())
          .cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))

  val qMixWeightsOracle: String =
    """SELECT source, count(*) AS n_docs,
      |       round(CAST(min(count(*)) OVER () AS DOUBLE) / count(*), 6) AS keep_rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // --- temperature-scaled mixing weights (UniMax / T5 style) ---
  // Sampling weight w_i ∝ n_i^(1/T) with T = 2: up-weights rare domains
  // relative to proportional sampling without flattening to uniform.
  // n^(1/2) is computed with sqrt (IEEE correctly-rounded in BOTH engines
  // — a libm pow could differ in the last ulp between JVM and C++),
  // rounded to 6 decimals, and normalized with an exact DECIMAL window
  // sum over the one-row-per-source post-aggregation table. Like
  // q_mix_weights, everything after the single groupBy touches only
  // |sources| rows.
  def qMixTemperature(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("r", round(sqrt(col("n_docs").cast("double")), 6)
        .cast("decimal(28,6)"))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(Window.partitionBy()), 6).as("p_raw"),
        round(col("r").cast("double") /
          sum(col("r")).over(Window.partitionBy()).cast("double"), 6)
          .as("w_temp"))
      .orderBy(col("source"))

  val qMixTemperatureOracle: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS DECIMAL(28,6)) AS r
      |  FROM documents GROUP BY source
      |)
      |SELECT source, n_docs,
      |       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS p_raw,
      |       round(CAST(r AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE), 6) AS w_temp
      |FROM c ORDER BY source""".stripMargin

  // --- k-fold cross-validation assignment ---
  // Deterministic, engine-portable fold assignment (salted md5 mod k —
  // the q_train_test_split recipe) with the balance report a CV
  // harness checks before training: per-fold doc/token counts and the
  // fold share in ppm. Pure per-row hashing plus one
  // map-side-combinable aggregation; a fold is reproducible from the
  // doc id alone, so workers assign folds independently with no join
  // against an assignment table.
  def qKfold(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
      .withColumn("fold", expr(
        "cast(conv(substring(md5(concat('fold42:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 5"))
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
    val tot = d.agg(count(lit(1)).as("total"))
    d.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("1000000 * n_docs div total"))
      .select(col("fold"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("share_ppm"))
      .orderBy(col("fold"))
  }

  val qKfoldOracle: String =
    """WITH d AS (
      |  SELECT CAST('0x' || substr(md5('fold42:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 5 AS fold,
      |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |         lang
      |  FROM documents),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM d)
      |SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(1000000 * count(*) // total AS BIGINT) AS share_ppm
      |FROM d CROSS JOIN t GROUP BY fold, total ORDER BY fold""".stripMargin

  // --- length-bucketed batching plan ---
  // Inference/training batching wastes compute on padding when short
  // and long sequences share a batch; bucketing by rounded length
  // first is the standard fix. Buckets are token counts rounded up to
  // 32 (capped at 512); batches of 8 form inside each bucket in
  // salted-md5 order (deterministic, reproducible from ids); waste is
  // the exact integer sum of (batch_max - len) over members, reported
  // per bucket in ppm of the padded volume. Batches form within
  // (bucket, shard) — the q_pack_sequences shard trick: a bare
  // per-bucket window has only |buckets| partitions, and the 10x probe
  // measured it 13x slower at 10x rows; with 8 id-derived shards the
  // rank window parallelizes and batches simply never span shards
  // (each shard is an independent batching stream, which is what a
  // distributed batcher ships anyway).
  def qLengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .withColumn("bucket", least(expr("((n + 31) div 32) * 32"), lit(512L)))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat('batch7:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"))
    val ranked = d.withColumn("rk", row_number().over(
        Window.partitionBy(col("bucket"), col("shard"))
          .orderBy(col("h"), col("doc_id"))))
      .withColumn("batch_id", expr("(rk - 1) div 8"))
    val batches = ranked.groupBy(col("bucket"), col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("bn"), max(col("n")).as("bmax"), sum(col("n")).as("bsum"))
    batches.groupBy(col("bucket"))
      .agg(sum(col("bn")).as("n_docs"), count(lit(1)).as("n_batches"),
        sum(col("bmax") * col("bn") - col("bsum")).as("pad_tokens"),
        sum(col("bmax") * col("bn")).as("padded_volume"))
      .withColumn("pad_ppm",
        expr("1000000 * pad_tokens div greatest(padded_volume, 1)"))
      .select(col("bucket"), col("n_docs"), col("n_batches"),
        col("pad_tokens"), col("pad_ppm"))
      .orderBy(col("bucket"))
  }

  val qLengthBucketsOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n,
      |         least(((CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) + 31) // 32) * 32, 512) AS bucket,
      |         CAST('0x' || substr(md5('batch7:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n, bucket, shard,
      |         (row_number() OVER (PARTITION BY bucket, shard ORDER BY h, doc_id) - 1) // 8 AS batch_id
      |  FROM d),
      |b AS (
      |  SELECT bucket, shard, batch_id, CAST(count(*) AS BIGINT) AS bn,
      |         CAST(max(n) AS BIGINT) AS bmax, CAST(sum(n) AS BIGINT) AS bsum
      |  FROM r GROUP BY 1, 2, 3),
      |g AS (
      |  SELECT bucket, CAST(sum(bn) AS BIGINT) AS n_docs,
      |         CAST(count(*) AS BIGINT) AS n_batches,
      |         CAST(sum(bmax * bn - bsum) AS BIGINT) AS pad_tokens,
      |         CAST(sum(bmax * bn) AS BIGINT) AS padded_volume
      |  FROM b GROUP BY 1)
      |SELECT bucket, n_docs, n_batches, pad_tokens,
      |       CAST(1000000 * pad_tokens // greatest(padded_volume, 1) AS BIGINT) AS pad_ppm
      |FROM g ORDER BY bucket""".stripMargin

  // --- as-of join via the NATIVE custom operator ---
  // Same semantics and same DuckDB ASOF JOIN oracle as qAsofJoin, but
  // executed by graft.plans.AsOfJoinExec — the custom LogicalPlan +
  // SparkStrategy + SparkPlan route (SURVEY §7.3's (c) tier): both
  // sides co-partitioned on the key and sorted (key, time) by
  // EnsureRequirements, then ONE streaming merge per partition with
  // O(1) carried state. Three independent implementations of as-of
  // (this exec, the union+window form, DuckDB's native ASOF) now gate
  // against each other.
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("ms", unix_millis(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ms").as("c_ms"), col("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ms").as("p_ms"))
    graft.plans.AsOfJoinNative
      .asof(purchases, clicks, "p_user", "c_user", "p_ms", "c_ms")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), (col("p_ms") - col("c_ms")).as("lag_ms"))
      .orderBy(col("purchase_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_native" -> (qAsofNative _),
    "q_length_buckets" -> (qLengthBuckets _),
    "q_ndcg_eval" -> (qNdcgEval _),
    "q_kfold" -> (qKfold _),
    "q_mix_weights" -> (qMixWeights _),
    "q_mix_temperature" -> (qMixTemperature _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_asof_join" -> (qAsofJoin _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_balanced_sample" -> (qBalancedSample _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_train_test_split" -> (qTrainTestSplit _),
    "q_tfidf_topk" -> (qTfidfTopk _),
    "q_bm25_topk" -> (qBm25Topk _),
    "q_rank_fusion" -> (qRankFusion _),
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_pack_spans" -> (qPackSpans _),
    "q_decontaminate_skew" -> (qDecontaminateSkew _),
    "q_decontaminate_bloom" -> (qDecontaminateBloom _),
    "q_shuffle_shard" -> (qShuffleShard _),
    "q_zorder_layout" -> (qZorderLayout _))

  def oracles: Map[String, String] = Map(
    "q_asof_native" -> qAsofJoinOracle,
    "q_length_buckets" -> qLengthBucketsOracle,
    "q_ndcg_eval" -> qNdcgEvalOracle,
    "q_kfold" -> qKfoldOracle,
    "q_mix_weights" -> qMixWeightsOracle,
    "q_mix_temperature" -> qMixTemperatureOracle,
    "q_decontaminate" -> qDecontaminateOracle,
    "q_asof_join" -> qAsofJoinOracle,
    "q_sample_stratified" -> qSampleStratifiedOracle,
    "q_balanced_sample" -> qBalancedSampleOracle,
    "q_weighted_sample" -> qWeightedSampleOracle,
    "q_train_test_split" -> qTrainTestSplitOracle,
    "q_tfidf_topk" -> qTfidfTopkOracle,
    "q_bm25_topk" -> qBm25TopkOracle,
    "q_rank_fusion" -> qRankFusionOracle,
    "q_embed_quantize" -> qEmbedQuantizeOracle,
    "q_pack_sequences" -> qPackSequencesOracle,
    "q_pack_spans" -> qPackSpansOracle,
    // identical output contract to the broadcast path — same oracle
    "q_decontaminate_skew" -> qDecontaminateOracle,
    "q_decontaminate_bloom" -> qDecontaminateOracle,
    "q_shuffle_shard" -> qShuffleShardOracle,
    "q_zorder_layout" -> qZorderLayoutOracle)
}
