package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Corpus-curation operators: CCNet-style perplexity bucketing from an
  * in-plan trained bigram LM, per-source distribution drift (KL) between
  * snapshots, and blocked fuzzy entity matching.
  *
  * Cross-engine determinism follows the repo's langid recipe: log-probs
  * are rounded to fixed decimals and summed as DECIMAL (exact,
  * order-insensitive), divisions happen once in double, and every
  * ranking has a total order (value, then id).
  */
object CurationQueries {

  // --- perplexity filter: train word-bigram LM, bucket head/middle/tail ---
  // The CCNet quality signal (Wenzek et al., LREC'20): score every
  // document by LM perplexity and split each language into head (most
  // LM-like) / middle / tail terciles — tail docs are the deletion or
  // down-weight candidates. Here the LM itself is trained IN the same
  // plan: per-language Laplace-smoothed word-bigram log-probs
  // (log10((c_bigram + 1) / (c_context + V_lang))), exactly the
  // train-then-score shape of qLangIdNb. Per-doc score is the average
  // negative log-prob over its bigram instances: decimal-summed (shuffle
  // order cannot move it), divided ONCE in double. Bucketing is
  // ntile(3) over a TOTAL order (score, doc_id) so both engines cut the
  // terciles identically.
  //
  // 100 TB shape: the log-prob table is bounded by vocabulary² per
  // language, not corpus size, and broadcasts to the scoring join; the
  // only big shuffles are the two training aggregations and the per-doc
  // score aggregation, all on high-cardinality keys.
  def qPerplexity(spark: SparkSession, dir: String): DataFrame = {
    // Identical-content collapse (round 11, same move as
    // q_langid_nb/q_lm_quality — PerplexityCollapseSpec pins it): the
    // bigram stream, training counts (weighted by copy count) and the
    // per-group score run once per distinct (lang, text); members
    // inherit avg_nlp by hash join before the ntile window. The
    // distinct-word vocabulary needs no weighting (duplicates add no
    // new words). Bigrams of one group explode scan-locally, so the
    // per-group bigram counts collapse map-side before their shuffle.
    val trunc = trim(col("text"))
    val grp = documents(spark, dir)
      .select(col("lang"), trunc.as("s"))
      .groupBy(col("lang"), md5(col("s")).as("th"))
      .agg(count(lit(1)).as("gsz"), min(col("s")).as("s"))
      .select(col("lang"), col("th"), col("gsz"),
        split(col("s"), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    // bigrams via arrays_zip of two slices, NOT transform(sequence(...),
    // lambda): a higher-order function is evaluated interpreted (lambda
    // functions never enter whole-stage codegen), and this query's
    // in-run bench floor was dominated by re-JITting that interpreter
    // path after other queries displaced it (round 12: cold-JVM sample
    // 7.7 s vs warm 1.66 s, in-run min-of-3 ~2.9 s; the zip form
    // compiles with the stage). Same (w1, w2) stream, oracle unchanged.
    val t = col("t")
    val big = grp
      .select(col("th"), col("lang"), col("gsz"),
        slice(t, lit(1), size(t) - 1).as("w1s"),
        slice(t, lit(2), size(t) - 1).as("w2s"))
      .select(col("th"), col("lang"), col("gsz"),
        explode(arrays_zip(col("w1s"), col("w2s"))).as("b"))
      .select(col("th"), col("lang"), col("gsz"),
        col("b.w1s").as("w1"), col("b.w2s").as("w2"))
      .transform(graft.CacheScope.persist) // feeds bigram counts, context counts, and scoring
    val cBig = big.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(sum(col("gsz")).as("c_big"))
      // vocabulary²-bounded per language, referenced by cCtx, vocab and
      // the logp join — metadata scale, safe to cache (unlike the fat
      // bigram stream, whose duplicate-aggregation trade was measured)
      .transform(graft.CacheScope.persist)
    // context counts FROM the bigram counts, not a second pass over the
    // bigram stream (optimization r16, guide §1.2): c_ctx(lang, w1) =
    // Σ_w2 c_big(lang, w1, w2) by definition — the re-aggregation runs
    // over the vocabulary²-bounded count table instead of shuffling the
    // corpus-scale stream a second time.
    val cCtx = cBig.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c_big")).as("c_ctx"))
    // vocabulary from the bigram COUNT table, not the stream (r15 moved
    // it off grp; r16 moves it off big too): distinct-union is
    // multiplicity-insensitive, so w1 ∪ w2 over distinct (lang, w1, w2)
    // rows is exactly the token set — for a >= 2-token doc, w1 covers
    // positions 1..n-1 and w2 position n, and the per-lang DISTINCT
    // count is unchanged.
    val vocab = cBig.select(col("lang"), col("w1").as("w"))
      .unionByName(cBig.select(col("lang"), col("w2").as("w")))
      .groupBy(col("lang")).agg(countDistinct(col("w")).as("v"))
    val logp = cBig
      .join(cCtx, Seq("lang", "w1"))
      .join(broadcast(vocab), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"),
        round(log10((col("c_big") + 1).cast("double") / (col("c_ctx") + col("v"))), 6)
          .cast("decimal(28,6)").as("lp"))
    val grpBig = big.groupBy(col("th"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val groupScore = grpBig
      .join(broadcast(logp), Seq("lang", "w1", "w2"))
      .groupBy(col("th"), col("lang"))
      .agg(sum(col("lp") * col("cnt")).as("s"), sum(col("cnt")).as("n"))
      .select(col("th"), col("lang"),
        ((-col("s")).cast("double") / col("n")).as("avg_nlp"))
    val scored = documents(spark, dir)
      .select(col("doc_id"), col("lang"), md5(trunc).as("th"))
      .join(groupScore, Seq("lang", "th"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("avg_nlp"), col("doc_id"))))
    scored
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("avg_nlp")), 4).as("min_nlp"),
        round(max(col("avg_nlp")), 4).as("max_nlp"))
      .orderBy(col("lang"), col("bucket"))
  }

  val qPerplexityOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents WHERE length(string_split_regex(trim(text), '\s+')) >= 2),
      |big AS (
      |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
      |  FROM tk, (SELECT unnest(generate_series(1, 2000)) AS i) ix
      |  WHERE i <= length(t) - 1),
      |cb AS (SELECT lang, w1, w2, count(*) AS c_big FROM big GROUP BY 1, 2, 3),
      |cc AS (SELECT lang, w1, count(*) AS c_ctx FROM big GROUP BY 1, 2),
      |vl AS (SELECT lang, count(DISTINCT w) AS v
      |       FROM (SELECT lang, unnest(t) AS w FROM tk) GROUP BY 1),
      |lp AS (
      |  SELECT lang, w1, w2,
      |         CAST(round(log10((c_big + 1.0) / (c_ctx + v)), 6) AS DECIMAL(28,6)) AS lp
      |  FROM cb JOIN cc USING (lang, w1) JOIN vl USING (lang)),
      |db AS (SELECT doc_id, lang, w1, w2, count(*) AS cnt FROM big GROUP BY 1, 2, 3, 4),
      |sc AS (
      |  SELECT doc_id, lang, sum(lp * cnt) AS s, sum(cnt) AS n
      |  FROM db JOIN lp USING (lang, w1, w2) GROUP BY 1, 2),
      |r AS (
      |  SELECT doc_id, lang, CAST(-s AS DOUBLE) / n AS avg_nlp,
      |         ntile(3) OVER (PARTITION BY lang
      |           ORDER BY CAST(-s AS DOUBLE) / n, doc_id) AS bucket
      |  FROM sc)
      |SELECT lang, bucket, count(*) AS n_docs,
      |       round(min(avg_nlp), 4) AS min_nlp, round(max(avg_nlp), 4) AS max_nlp
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- distribution drift: per-source KL divergence between snapshots ---
  // The corpus-monitoring question "did this source's language mix
  // shift?": split each source into two deterministic snapshots — block
  // parity `(doc_id div 20) % 2`, NOT raw doc_id parity, because the
  // fixture assigns source = doc_id % 20 and raw parity would give every
  // source exactly one half — Laplace-smooth both language distributions over the
  // GLOBAL language set (the source × lang grid makes absent languages
  // explicit so the smoothed q is never zero), and report
  // KL(P_even || P_odd) = Σ p·ln(p/q). Terms are rounded to 8 decimals
  // and decimal-summed — the sum is over |languages| terms and must not
  // depend on shuffle order. Everything after the two counting
  // aggregations is broadcast-sized (sources × languages).
  def qDistDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("source"), col("lang"))
    val langs = d.select(col("lang")).distinct()
    val nLang = langs.agg(count(lit(1)).as("n_lang"))
    val grid = d.select(col("source")).distinct().crossJoin(langs)
    val even = d.filter(expr("(doc_id div 20) % 2") === 0)
    val odd = d.filter(expr("(doc_id div 20) % 2") === 1)
    val cEven = even.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c_even"))
    val cOdd = odd.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c_odd"))
    val tEven = even.groupBy(col("source")).agg(count(lit(1)).as("n_even"))
    val tOdd = odd.groupBy(col("source")).agg(count(lit(1)).as("n_odd"))
    grid
      .join(cEven, Seq("source", "lang"), "left")
      .join(cOdd, Seq("source", "lang"), "left")
      .join(broadcast(tEven), Seq("source"))
      .join(broadcast(tOdd), Seq("source"))
      .join(broadcast(nLang), lit(true))
      .select(col("source"), col("n_even"), col("n_odd"),
        ((coalesce(col("c_even"), lit(0L)) + 1).cast("double") /
          (col("n_even") + col("n_lang"))).as("p"),
        ((coalesce(col("c_odd"), lit(0L)) + 1).cast("double") /
          (col("n_odd") + col("n_lang"))).as("q"))
      .withColumn("term",
        round(col("p") * log(col("p") / col("q")), 8).cast("decimal(28,8)"))
      .groupBy(col("source"))
      .agg(max(col("n_even")).as("n_even"), max(col("n_odd")).as("n_odd"),
        round(sum(col("term")).cast("double"), 6).as("kl_div"))
      .orderBy(col("source"))
  }

  val qDistDriftOracle: String =
    """WITH d AS (SELECT doc_id, source, lang FROM documents),
      |nl AS (SELECT count(DISTINCT lang) AS n_lang FROM d),
      |grid AS (SELECT DISTINCT s.source, l.lang
      |         FROM (SELECT DISTINCT source FROM d) s, (SELECT DISTINCT lang FROM d) l),
      |ce AS (SELECT source, lang, count(*) AS c_even FROM d WHERE (doc_id // 20) % 2 = 0 GROUP BY 1, 2),
      |co AS (SELECT source, lang, count(*) AS c_odd FROM d WHERE (doc_id // 20) % 2 = 1 GROUP BY 1, 2),
      |te AS (SELECT source, count(*) AS n_even FROM d WHERE (doc_id // 20) % 2 = 0 GROUP BY 1),
      |tod AS (SELECT source, count(*) AS n_odd FROM d WHERE (doc_id // 20) % 2 = 1 GROUP BY 1),
      |terms AS (
      |  SELECT g.source, te.n_even, tod.n_odd,
      |         CAST(round(
      |           ((coalesce(ce.c_even, 0) + 1.0) / (te.n_even + nl.n_lang)) *
      |           ln(((coalesce(ce.c_even, 0) + 1.0) / (te.n_even + nl.n_lang)) /
      |              ((coalesce(co.c_odd, 0) + 1.0) / (tod.n_odd + nl.n_lang))), 8)
      |           AS DECIMAL(28,8)) AS term
      |  FROM grid g
      |  LEFT JOIN ce ON g.source = ce.source AND g.lang = ce.lang
      |  LEFT JOIN co ON g.source = co.source AND g.lang = co.lang
      |  JOIN te ON g.source = te.source
      |  JOIN tod ON g.source = tod.source
      |  CROSS JOIN nl)
      |SELECT source, max(n_even) AS n_even, max(n_odd) AS n_odd,
      |       round(CAST(sum(term) AS DOUBLE), 6) AS kl_div
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin

  // --- blocked fuzzy entity matching (record linkage) ---
  // Entity resolution without a cartesian product: probe records (every
  // 20th customer with one character deleted from its name — a
  // deterministic "dirty" feed) are matched back to the clean table in
  // three stages. (1) BLOCK by DELETION NEIGHBORHOOD (FastSS, Bocek et
  // al. 2007; popularized as SymSpell): if levenshtein(a, b) <= 2 then
  // deleting the <= 2 edit positions from each side yields a COMMON
  // string, so both sides index every variant reachable by deleting up
  // to 2 characters (1 + n + n(n-1)/2 keys per record, bounded by name
  // length, embarrassingly parallel) and candidate generation is a pure
  // EQUI-join on the variant. This is lossless for ED <= 2 and — unlike
  // length or prefix blocking — has no degenerate block: the fixture's
  // names share their length AND a 9-char prefix, which collapsed a
  // length-blocked first cut into an all-pairs verify (33 s at sf0.1 vs
  // ~2 s for this plan; the variant keys carry the distinguishing
  // digits, so posting lists stay short). (2) VERIFY exact levenshtein
  // on the distinct collided pairs only. (3) RESOLVE best match per
  // probe under the total order (distance, candidate key). Ambiguity is
  // real: probe "Customer#00000000" sits at distance 1 from ten clean
  // names; the deterministic tiebreak picks the smallest key.
  // The declarative deletion-neighborhood form. Retired from the query
  // hot paths in favor of the native [[graft.functions.DelNeighborsExpr]]
  // (one compiled pass, no variant-string allocation); kept as the
  // independently-derived witness DelNeighborsExprSpec pins the native
  // expression against (each substring/concat step is a separate Catalyst
  // builtin here, so agreement is meaningful).
  private[graft] def delNeighborhood(c: String): String =
    s"""array_distinct(concat(
       |  array($c),
       |  transform(sequence(1, length($c)), i ->
       |    concat(substring($c, 1, i-1), substring($c, i+1, 100000))),
       |  CASE WHEN length($c) >= 2 THEN
       |    flatten(transform(sequence(1, length($c) - 1), i ->
       |      transform(sequence(i+1, length($c)), j ->
       |        concat(substring($c, 1, i-1), substring($c, i+1, j-i-1),
       |               substring($c, j+1, 100000)))))
       |  ELSE array() END))""".stripMargin

  def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val probes = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("probe_key"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1000))
          .as("dirty_name"))
    // Identical-name collapse on BOTH sides (the er_clusters lesson,
    // re-learned when the 100x rehearsal replicated customers): records
    // sharing an exact name have identical match behavior, so blocking +
    // verify run once per distinct name and probes rejoin by name at the
    // end. Exact for the (dist, cand_key) tiebreak too — within a
    // candidate name group distance is constant, so the winning key is
    // that group's MIN key, which is what the group representative
    // carries. Without this, k exact copies of a name multiply the
    // variant posting lists by k on both sides and the candidate join
    // by k² (measured 19.6x wall at 10x replicated data; ~2x after).
    val pNames = probes.select(col("dirty_name")).distinct()
    val cGroups = cust.groupBy(col("c_name"))
      .agg(min(col("c_custkey")).as("cand_key"))
    // join on the 64-bit hash of the variant, not the string: half the
    // shuffle bytes, and a hash collision can only ADD a candidate pair,
    // which the exact levenshtein verify then rejects — lossless
    val candIdx = cGroups.select(col("cand_key"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("c_name")))
        .as("variant"))
    val probeIdx = pNames.select(col("dirty_name"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("dirty_name")))
        .as("variant"))
    // a near pair shares MANY del-variants (every common deletion of the
    // edit positions), so the raw join multiplies each pair ~30x — dedup
    // on the bare (name, long) key pair and re-join the names afterwards,
    // keeping the candidate strings out of the heavy shuffle
    // the dirty batch is the small side (a daily feed vs the full
    // reference table): broadcast ITS variant index so the reference
    // index never shuffles — explode hides stats from AQE, so the hint
    // is explicit
    val bestPerName = broadcast(probeIdx)
      .join(candIdx, Seq("variant"))
      .select(col("dirty_name"), col("cand_key"))
      .distinct()
      .join(cGroups.select(col("cand_key"), col("c_name").as("cand_name")),
        Seq("cand_key"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("cand_name")))
      .filter(col("dist") <= 2)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("dirty_name")).orderBy(col("dist"), col("cand_key"))))
      .filter(col("rk") === 1)
      .select(col("dirty_name"), col("cand_key"), col("dist"))
    probes.join(bestPerName, Seq("dirty_name"))
      .select(col("probe_key"), col("dirty_name"),
        col("cand_key").as("matched_key"), col("dist").cast("long").as("dist"))
      .orderBy(col("probe_key"))
  }

  val qFuzzyMatchOracle: String =
    """WITH probes AS (
      |  SELECT c_custkey AS probe_key,
      |         substr(c_name, 1, 9) || substr(c_name, 11) AS dirty_name
      |  FROM customer WHERE c_custkey % 20 = 0),
      |blocked AS (
      |  SELECT probe_key, dirty_name, length(dirty_name) + d AS blen
      |  FROM probes, (SELECT unnest([-2, -1, 0, 1, 2]) AS d) ds),
      |cands AS (
      |  SELECT c_custkey AS cand_key, c_name AS cand_name, length(c_name) AS blen
      |  FROM customer),
      |v AS (
      |  SELECT probe_key, dirty_name, cand_key,
      |         levenshtein(dirty_name, cand_name) AS dist
      |  FROM blocked JOIN cands USING (blen)
      |  WHERE levenshtein(dirty_name, cand_name) <= 2),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY probe_key ORDER BY dist, cand_key) AS rk
      |  FROM v)
      |SELECT probe_key, dirty_name, cand_key AS matched_key, dist
      |FROM r WHERE rk = 1 ORDER BY probe_key""".stripMargin

  /** name -> query builder, for SparkEntry. */
  // --- entity resolution end-to-end: block -> verify -> cluster ---
  // The full ER pipeline the pieces above exist for: a dirty batch
  // (customer names with one char deleted) is matched against the
  // master table via the same FastSS deletion-neighborhood blocking as
  // q_fuzzy_match, kept at ALL matches with lev <= 2 (not best-of-1),
  // and the resulting bipartite match graph is resolved into entities
  // with graft.ops.ConnectedComponents — two dirty records matching
  // the same master row, or one dirty record bridging two master rows,
  // land in one entity. Output: every matched record (dirty ids offset
  // by 1e6) with its entity id = min record id in the cluster. Scale
  // shape: blocking bounds candidates (no name cross join), the match
  // graph is star-like so CC converges in 2 log-rounds, and the heavy
  // strings never enter the CC shuffle (ids only). Oracle: the same
  // length-blocked levenshtein pairs + recursive-CTE closure.
  //
  // Identical-name collapse (the ngram-dedup lesson, re-learned here on
  // the 10x probe: 86.6 s -> the distinct-name level): records sharing
  // an exact name have IDENTICAL match adjacency, so blocking + verify
  // run once per distinct name (node id = min member id, making the
  // component minimum invariant under expansion) and members rejoin
  // after CC. Lossless by construction; on a duplicate-heavy feed this
  // is the difference between candidate volume ~distinct² and ~records²
  // — exact-duplicate names are the norm in real dirty batches.
  def qErClusters(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val probes = cust.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") + 1000000L).as("probe_id"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1000))
          .as("dirty_name"))
    // one representative per distinct name on each side; the group node
    // carries min(member id) so comp minima survive expansion
    val mGroups = cust.groupBy(col("c_name"))
      .agg(min(col("c_custkey")).as("m_node"))
      .transform(graft.CacheScope.persist)
    val pGroups = probes.groupBy(col("dirty_name"))
      .agg(min(col("probe_id")).as("p_node"))
      .transform(graft.CacheScope.persist)
    val candIdx = mGroups.select(col("m_node"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("c_name")))
        .as("variant"))
    val probeIdx = pGroups.select(col("p_node"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("dirty_name")))
        .as("variant"))
    val pairs = broadcast(probeIdx)
      .join(candIdx, Seq("variant"))
      .select(col("p_node"), col("m_node"))
      .distinct()
      .join(pGroups, Seq("p_node"))
      .join(mGroups, Seq("m_node"))
      .filter(levenshtein(col("dirty_name"), col("c_name")) <= 2)
      .select(col("p_node").as("src"), col("m_node").as("dst"))
    val comps = graft.ops.ConnectedComponents.components(pairs)
    // expand group components back to member records
    val mMembers = cust.join(mGroups, Seq("c_name"))
      .select(col("m_node").as("id"), col("c_custkey").as("record_id"))
    val pMembers = probes.join(pGroups, Seq("dirty_name"))
      .select(col("p_node").as("id"), col("probe_id").as("record_id"))
    mMembers.unionByName(pMembers)
      .join(comps, Seq("id"))
      .select(col("record_id"), col("comp").as("entity_id"))
      .orderBy(col("record_id"))
  }

  val qErClustersOracle: String =
    """WITH RECURSIVE probes AS (
      |  SELECT c_custkey + 1000000 AS probe_id,
      |         substr(c_name, 1, 9) || substr(c_name, 11) AS dirty_name
      |  FROM customer WHERE c_custkey % 20 = 0),
      |blocked AS (
      |  SELECT probe_id, dirty_name, length(dirty_name) + d AS blen
      |  FROM probes, (SELECT unnest([-2, -1, 0, 1, 2]) AS d) ds),
      |cands AS (
      |  SELECT c_custkey AS cand_key, c_name AS cand_name,
      |         length(c_name) AS blen
      |  FROM customer),
      |pairs AS (
      |  SELECT DISTINCT probe_id AS src, cand_key AS dst
      |  FROM blocked JOIN cands USING (blen)
      |  WHERE levenshtein(dirty_name, cand_name) <= 2),
      |adj AS (
      |  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
      |), reach(src, dst) AS (
      |  SELECT src, dst FROM adj
      |  UNION
      |  SELECT r.src, a.dst FROM reach r JOIN adj a ON r.dst = a.src
      |)
      |SELECT v.id AS record_id,
      |       CAST(least(v.id, min(r.dst)) AS BIGINT) AS entity_id
      |FROM (SELECT DISTINCT src AS id FROM adj) v
      |LEFT JOIN reach r ON r.src = v.id
      |GROUP BY v.id
      |ORDER BY 1""".stripMargin

  // --- count-min sketch: fixed-size frequency summary + point queries ---
  // The d=4 x w=64 counter grid (Cormode & Muthukrishnan 2005): every
  // token increments one cell per hash row, a point estimate is the MIN
  // over its d cells, and est >= true always (one-sided error, bounded
  // by e*N/w with the usual probabilistic guarantee). The distributed
  // shape is what matters at 100 TB: the sketch is a groupBy over at
  // most d*w = 256 cells — map-side combine collapses every partition
  // to <= 256 partials regardless of corpus size, and two sketches
  // merge by cell-wise ADD, so the same plan serves batch, incremental
  // (add yesterday's sketch), and streaming. The d hash rows come from
  // ONE md5 per increment — four disjoint 8-hex-digit slices of the
  // 128-bit digest (the standard trick for deriving d row hashes from a
  // single strong hash: one hash invocation, not d; measured 1.7x on
  // the sketch build). md5 is the repo's
  // portable md5 recipe, so DuckDB reproduces the sketch bit-for-bit
  // and the oracle gates EXACT cell values, not a loose contract; the
  // probe output carries est - true per token (>= 0 by construction,
  // asserted in spec).
  def qCountmin(spark: SparkSession, dir: String): DataFrame = {
    // spread (optimization r15): the token explode feeds both the sketch
    // cells (one md5 per occurrence) and the truth counts, and ran
    // inside the single-split scan stage — one core, twice. Scale-
    // conditional no-op on multi-split sources.
    val toksDf = spread(documents(spark, dir).select(col("text")))
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    // one md5 per occurrence; hash row r reads digest hex [8r+1, 8r+8]
    val cells = toksDf
      .withColumn("h", md5(concat(lit("cm:"), col("tok"))))
      .select(col("h"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket", expr(
        "cast(conv(substring(h, 8 * r + 1, 8), 16, 10) as bigint) % 64"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
    val truth = toksDf.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    val probes = truth
      .filter(col("tok").isin("spark", "window", "merge", "slow", "customer",
        "hash", "scan", "batch"))
    probes
      .withColumn("h", md5(concat(lit("cm:"), col("tok"))))
      .select(col("tok"), col("true_cnt"), col("h"),
        explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket", expr(
        "cast(conv(substring(h, 8 * r + 1, 8), 16, 10) as bigint) % 64"))
      .join(cells, Seq("r", "bucket"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cell")).as("est"))
      .select(col("tok"), col("true_cnt"), col("est"),
        (col("est") - col("true_cnt")).as("overcount"))
      .orderBy(col("tok"))
  }

  val qCountminOracle: String =
    """WITH t AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
      |), tnz AS (SELECT tok FROM t WHERE tok <> ''
      |), inc AS (
      |  SELECT tok, r,
      |         CAST('0x' || substr(md5('cm:' || tok), 8 * r + 1, 8) AS BIGINT) % 64 AS bucket
      |  FROM tnz CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
      |), cells AS (
      |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS cell FROM inc GROUP BY 1, 2
      |), truth AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM tnz GROUP BY 1
      |), probes AS (
      |  SELECT tok, true_cnt, r,
      |         CAST('0x' || substr(md5('cm:' || tok), 8 * r + 1, 8) AS BIGINT) % 64 AS bucket
      |  FROM truth CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
      |  WHERE tok IN ('spark', 'window', 'merge', 'slow', 'customer',
      |                'hash', 'scan', 'batch')
      |)
      |SELECT p.tok, p.true_cnt, min(c.cell) AS est,
      |       min(c.cell) - p.true_cnt AS overcount
      |FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
      |GROUP BY 1, 2
      |ORDER BY p.tok""".stripMargin

  // --- golden record (survivorship over resolved entities) ---
  // The step after entity resolution: collapse each entity's member
  // records into ONE canonical record under explicit survivorship rules
  // (MDM "survivorship"; Bleiholder & Naumann 2009 data fusion). Fixture:
  // every 20th master receives a 3-record dirty feed — two ingests that
  // lost the SAME character (duplicate submissions) and one that lost a
  // different one — and each dirty record is resolved to its best master
  // by the same FastSS deletion-neighborhood blocking + exact-levenshtein
  // verify as q_fuzzy_match (rank 1 by (distance, master), so entities
  // are per-master and bounded — no transitive lev-chain blowup; the
  // truncated third variant is genuinely ambiguous and the total order
  // deterministically resolves it, sometimes to a smaller neighboring
  // master — the conflict-resolution behavior a fusion pass must pin,
  // not hide). Rules:
  // canonical name = most FREQUENT member name, ties lexicographically
  // (the mode rule — here the twice-submitted dirty variant beats the
  // master's own spelling, which is exactly what frequency survivorship
  // does and a recency/priority rule would not); master_id = smallest
  // member id. The mode is a groupBy min_by over (-cnt, name) — map-side
  // combinable argmin, no window over member lists.
  def qGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val dirty = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"), col("c_name"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("v"))
      .select((col("c_custkey") * 10 + col("v") + 10000000L).as("record_id"),
        when(col("v") === 3,
          expr("substring(c_name, 1, length(c_name) - 1)"))
          .otherwise(
            concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1000)))
          .as("name"))
    val dGroups = dirty.groupBy(col("name")).agg(min(col("record_id")).as("d_node"))
    val dIdx = dGroups.select(col("d_node"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("name")))
        .as("variant"))
    // Identical-name collapse on the MASTER side too (the fuzzy_match /
    // er_clusters recipe): distance to a probe name is constant within an
    // identical-name master group, and the group's min key IS the key
    // min_by((dist, key)) would pick from the expanded group — so the
    // variant index and the levenshtein verify run once per DISTINCT
    // master name. Lossless by the same argument as qFuzzyMatch; on a
    // duplicate-heavy master (the 100x rehearsal replicates customers
    // 100x) this removes a 100x posting-list and candidate-join factor.
    val mGroups = cust.groupBy(col("c_name"))
      .agg(min(col("c_custkey")).as("m_node"))
      .transform(graft.CacheScope.persist)
    val mIdx = mGroups.select(col("m_node"),
      explode(graft.functions.DelNeighborsExpr.delNeighborHashes(col("c_name")))
        .as("variant"))
    val best = broadcast(dIdx)
      .join(mIdx, Seq("variant"))
      .select(col("d_node"), col("m_node"))
      .distinct()
      .join(dGroups, Seq("d_node"))
      .join(mGroups.select(col("m_node"), col("c_name")), Seq("m_node"))
      .withColumn("dist", levenshtein(col("name"), col("c_name")))
      .filter(col("dist") <= 2)
      .groupBy(col("d_node"))
      .agg(min_by(col("m_node"), struct(col("dist"), col("m_node")))
        .as("entity_id"))
      // persisted (optimization r15): `members` (canon + the final agg)
      // references this subtree twice with different downstream prunings,
      // so the variant-index join + levenshtein verify ran twice per
      // execution (stage-metrics probe: two ~identical heavy stages).
      // One row per matched dirty-name group — metadata-scale.
      .transform(graft.CacheScope.persist)
    val members = dirty.join(dGroups, Seq("name"))
      .join(best, Seq("d_node"))
      .select(col("entity_id"), col("record_id"), col("name"))
      .unionByName(cust
        .select(col("c_custkey").as("entity_id"),
          col("c_custkey").as("record_id"), col("c_name").as("name")))
    // ONE two-level aggregation over members (optimization r16): the
    // canonical-name mode and the record stats both fold out of the
    // per-(entity, name) counts — n_records = Σ cnt, master_id = min of
    // the per-name min record_id — so the separate canon/stats passes
    // (each re-running the un-persisted members union + joins) and their
    // join-back collapse into a single pass. Same rules: mode with
    // lexicographic tie, smallest member id, entities with > 1 record.
    members
      .groupBy(col("entity_id"), col("name"))
      .agg(count(lit(1)).as("cnt"), min(col("record_id")).as("mid"))
      .groupBy(col("entity_id"))
      .agg(
        min_by(col("name"), struct((-col("cnt")).as("nc"), col("name")))
          .as("canonical_name"),
        count(lit(1)).as("n_names"),
        sum(col("cnt")).as("n_records"),
        min(col("mid")).as("master_id"))
      .filter(col("n_records") > 1)
      .select(col("entity_id"), col("master_id"), col("n_records"),
        col("n_names"), col("canonical_name"))
      .orderBy(col("entity_id"))
  }

  val qGoldenRecordOracle: String =
    """WITH dirty AS (
      |  SELECT c_custkey * 10 + v.v + 10000000 AS record_id,
      |         CASE WHEN v.v = 3
      |              THEN substr(c_name, 1, length(c_name) - 1)
      |              ELSE substr(c_name, 1, 9) || substr(c_name, 11) END AS name
      |  FROM customer, (SELECT unnest([1, 2, 3]) AS v) v
      |  WHERE c_custkey % 20 = 0),
      |best AS (
      |  SELECT d.record_id, c.c_custkey AS entity_id
      |  FROM dirty d JOIN customer c
      |    ON abs(length(d.name) - length(c.c_name)) <= 2
      |   AND levenshtein(d.name, c.c_name) <= 2
      |  QUALIFY row_number() OVER (PARTITION BY d.record_id
      |      ORDER BY levenshtein(d.name, c.c_name), c.c_custkey) = 1),
      |members AS (
      |  SELECT b.entity_id, d.record_id, d.name
      |  FROM dirty d JOIN best b USING (record_id)
      |  UNION ALL
      |  SELECT c_custkey, c_custkey, c_name FROM customer),
      |nc AS (
      |  SELECT entity_id, name, count(*) AS cnt
      |  FROM members GROUP BY 1, 2),
      |canon AS (
      |  SELECT entity_id, name AS canonical_name,
      |         CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_names
      |  FROM nc
      |  QUALIFY row_number() OVER (PARTITION BY entity_id
      |                             ORDER BY cnt DESC, name) = 1)
      |SELECT m.entity_id,
      |       CAST(min(m.record_id) AS BIGINT) AS master_id,
      |       CAST(count(*) AS BIGINT) AS n_records,
      |       any_value(c.n_names) AS n_names,
      |       any_value(c.canonical_name) AS canonical_name
      |FROM members m JOIN canon c USING (entity_id)
      |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin

  // --- k-anonymity audit over quasi-identifiers ---
  // The privacy-side companion to q_pii_redact: count equivalence
  // classes over the quasi-identifier combination (lang, source,
  // coarse length bucket) and report every class smaller than k = 5 —
  // the records a release would expose to re-identification by joining
  // on those attributes (Sweeney 2002). A release pipeline either
  // suppresses these rows or coarsens the QI. Pure two-level agg —
  // map-side combinable, one shuffle on the QI key; the small-class
  // report is bounded by k * |QI| regardless of corpus size.
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 5)
      .orderBy(col("lang"), col("source"), col("len_bucket"))

  val qKAnonymityOracle: String =
    """SELECT lang, source, n_chars // 100 AS len_bucket,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM documents
      |GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY 1, 2, 3""".stripMargin

  // --- embedding drift (centroid shift between snapshots) ---
  // The vector-space counterpart of q_dist_drift: per label, how far
  // the even-block centroid moved from the odd-block centroid —
  // detects representation drift between two ingestion snapshots (an
  // encoder change, a source-mix shift) that token-distribution KL
  // can't see. Per-(label, parity, dim) means use the BIGINT
  // micro-unit half-up recipe (order-free sums, exact in both
  // engines); the drift is the exact squared L2 distance between the
  // two centroids in e12 units. One map-side-combinable aggregation
  // whose shuffle carries 64·|labels|·2 cells regardless of corpus
  // size, then metadata-scale arithmetic.
  def qEmbedDrift(spark: SparkSession, dir: String): DataFrame = {
    val m = embeddings(spark, dir)
      .select(col("label"), (col("vec_id") % 2).as("parity"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .groupBy(col("label"), col("parity"), col("dim"))
      .agg(sum(expr(
          "CAST(CAST(round(x, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("s6"),
        count(lit(1)).as("n"))
      .select(col("label"), col("parity"), col("dim"), col("n"),
        expr("""CASE WHEN s6 >= 0
               |  THEN (2 * s6 + n) div (2 * n)
               |  ELSE -((2 * (-s6) + n) div (2 * n))
               |END""".stripMargin).as("m6"))
    val even = m.filter(col("parity") === 0)
      .select(col("label"), col("dim"), col("m6").as("me"), col("n").as("n_even"))
    val odd = m.filter(col("parity") === 1)
      .select(col("label"), col("dim"), col("m6").as("mo"), col("n").as("n_odd"))
    even.join(odd, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("n_even")).as("n_even"), max(col("n_odd")).as("n_odd"),
        sum((col("me") - col("mo")) * (col("me") - col("mo"))).as("drift2_e12"))
      .orderBy(col("label"))
  }

  val qEmbedDriftOracle: String =
    """WITH e AS (
      |  SELECT label, vec_id % 2 AS parity,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |cells AS (
      |  SELECT label, parity, i AS dim,
      |         CAST(sum(CAST(CAST(round(v[i + 1], 6) AS DECIMAL(18,6))
      |              * 1000000 AS BIGINT)) AS HUGEINT) AS s6,
      |         CAST(count(*) AS HUGEINT) AS n
      |  FROM e, (SELECT unnest(generate_series(0, 63)) AS i) di
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT label, parity, dim, n,
      |         CASE WHEN s6 >= 0 THEN (2 * s6 + n) // (2 * n)
      |              ELSE -((2 * (-s6) + n) // (2 * n)) END AS m6
      |  FROM cells)
      |SELECT a.label,
      |       CAST(max(a.n) AS BIGINT) AS n_even,
      |       CAST(max(b.n) AS BIGINT) AS n_odd,
      |       CAST(sum((a.m6 - b.m6) * (a.m6 - b.m6)) AS BIGINT) AS drift2_e12
      |FROM m a JOIN m b ON a.label = b.label AND a.dim = b.dim
      |WHERE a.parity = 0 AND b.parity = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_drift" -> (qEmbedDrift _),
    "q_kanonymity" -> (qKAnonymity _),
    "q_golden_record" -> (qGoldenRecord _),
    "q_perplexity" -> (qPerplexity _),
    "q_dist_drift" -> (qDistDrift _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_countmin" -> (qCountmin _),
    "q_er_clusters" -> (qErClusters _))

  /** name -> DuckDB oracle SQL, for the driver gate. */
  def oracles: Map[String, String] = Map(
    "q_embed_drift" -> qEmbedDriftOracle,
    "q_kanonymity" -> qKAnonymityOracle,
    "q_golden_record" -> qGoldenRecordOracle,
    "q_perplexity" -> qPerplexityOracle,
    "q_dist_drift" -> qDistDriftOracle,
    "q_fuzzy_match" -> qFuzzyMatchOracle,
    "q_countmin" -> qCountminOracle,
    "q_er_clusters" -> qErClustersOracle)
}
