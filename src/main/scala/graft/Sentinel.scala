package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing 100× scale-regression gate (VERDICT r10 item 1).
  *
  * The sf0.1 bench is blind to scale-shape regressions: §10.16's
  * broadcast-flip made dedup_simhash 3× slower at 100× while sf0.1 times
  * never moved. This gate runs the ~10 collapse/join-shape-critical ops
  * against the regenerable 100× replicated corpus and FAILS (exit 1) if
  * any exceeds its recorded wall-clock ceiling in `sentinels.json`
  * (checked in, like anchors.json; ceilings ≈ 1.5× the recorded
  * receipts, so a broadcast-flip-class 2–3× regression trips it even
  * under moderate box load — on a breach, re-run once to rule out an
  * extreme load burst before treating it as real).
  *
  *   sbt "runMain graft.Sentinel"              # gate: exit 1 on breach
  *   sbt "runMain graft.Sentinel --record"     # print fresh receipts JSON
  *
  * The corpus (default /tmp/docs100x) is regenerated via [[ProbeCorpus]]
  * if missing — only the three tables the sentinel ops read (documents,
  * embeddings, customer), so a wiped /tmp costs one rebuild, not a lost
  * gate. Cache is fully dropped between ops (same hygiene as Bench).
  */
object Sentinel {

  /** Fold every output value (ScaleProbe's honesty rule): count() lets
    * Catalyst prune projection-shaped work to a bare scan.
    */
  private def fold(df: DataFrame): Long = {
    val safe = df.toDF(df.columns.indices.map("c" + _): _*)
    safe.select(xxhash64(struct(safe.columns.map(col): _*)).as("h"))
      .agg(count(when(col("h") =!= 0L, 1)).as("n"), expr("bit_xor(h)"))
      .collect().head.getLong(0)
  }

  /** An op returns (rows, optional self-timed seconds). Self-timing is
    * for ops with untimed SETUP (the incremental index build is the
    * one-time cost; the gate watches the steady-state daily path).
    */
  private type Op = (SparkSession, String, String) => (Long, Option[Double])
  private def timed(f: (SparkSession, String, String) => Long): Op =
    (s, d, b) => (f(s, d, b), None)

  private[graft] val ops: Seq[(String, Op)] = Seq(
    "dedup_simhash" -> timed((s, d, _) =>
      queries.SketchDedupQueries.qDedupSimhash(s, d).count()),
    "dedup_minhash_lsh" -> timed((s, d, _) =>
      queries.SketchDedupQueries.qDedupMinhashLsh(s, d).count()),
    "dedup_components" -> timed((s, d, _) =>
      queries.SketchDedupQueries.qDedupComponents(s, d).count()),
    "semdedup" -> timed((s, d, _) =>
      queries.SimilarityQueries.qSemDedup(s, d).count()),
    "phash_neardup" -> timed((s, d, _) =>
      queries.MultimodalQueries.qPhashNeardup(s, d).count()),
    "er_clusters" -> timed((s, d, _) =>
      queries.CurationQueries.qErClusters(s, d).count()),
    // production decontamination shape: CONSTANT benchmark (an eval
    // suite does not grow with the corpus), broadcast strategy
    "decontaminate_const" -> timed((s, d, b) =>
      pipeline.CorpusPipeline(Tables.documents(s, d))
        .decontaminate(Tables.documents(s, b).filter(col("doc_id") % 97 === 0))
        .df.count()),
    // projection-shaped: fold, or Catalyst times a bare scan
    "exact_substr" -> timed((s, d, _) =>
      fold(queries.CorpusOpsQueries.qExactSubstr(s, d)
        .select(col("clean_hash")))),
    // the per-token trio, collapse-carrying since round 11
    "langid_nb" -> timed((s, d, _) =>
      queries.TextQueries.qLangIdNb(s, d).count()),
    "lm_quality" -> timed((s, d, _) =>
      queries.TextQueries.qLmQuality(s, d).count()),
    "perplexity" -> timed((s, d, _) =>
      queries.CurationQueries.qPerplexity(s, d).count()),
    "pipeline_composed" -> timed((s, d, b) =>
      fold(PipelineProbe.composedChain(s, d, b))),
    // steady-state daily dedup: standing index build is SETUP (untimed);
    // the gate watches one day's batch (signatures → upsert → pairs)
    "incremental_daily" -> ((s, d, b) => {
      import queries.IncrementalDedupQueries._
      val docs = Tables.documents(s, d)
      val isBase = col("doc_id") < 10000000L
      val batchPred = isBase && col("doc_id") % 5 === 4
      val lake = java.nio.file.Files.createTempDirectory("sentinel-inc")
        .resolve("sig").toString
      updateIndex(s, signatures(docs.filter(!batchPred)), lake,
        ingestDate = Some("2026-08-12"))
      val t0 = System.nanoTime()
      val sigs = signatures(docs.filter(batchPred)).persist()
      updateIndex(s, sigs, lake, ingestDate = Some("2026-08-13"))
      val nPairs = pairsForBatchSigs(s.read.parquet(lake), sigs).count()
      val daySecs = (System.nanoTime() - t0) / 1e9
      sigs.unpersist()
      etl.LakeFs.deleteRecursively(s,
        new org.apache.hadoop.fs.Path(lake).getParent)
      (nPairs, Some(daySecs))
    })
  )

  def main(args: Array[String]): Unit = {
    val record = args.contains("--record")
    val rest = args.filterNot(_.startsWith("--"))
    val corpus = rest.headOption.getOrElse("/tmp/docs100x")
    val baseDir = rest.lift(1).getOrElse("/root/testdata/sf0.1")
    val sentinelsPath = sys.env.getOrElse("SPARK_GRAFT_SENTINELS", "sentinels.json")

    val spark = Tables.localSession(cores = 32)
    if (!new java.io.File(s"$corpus/documents.parquet").exists()) {
      println(s"[sentinel] corpus $corpus missing — regenerating 100x from $baseDir")
      ProbeCorpus.build(spark, baseDir, corpus, copies = 100,
        onlyTables = Some(Set("documents", "embeddings", "customer")))
    }

    // ceilings from sentinels.json (gate mode); absent file = record mode
    val ceilings: Map[String, Double] =
      if (record) Map.empty
      else {
        val f = new java.io.File(sentinelsPath)
        require(f.isFile, s"sentinels file not found: $sentinelsPath " +
          "(run with --record to generate receipts)")
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        val o = root.get("ops")
        val it = o.fieldNames()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) {
          val n = it.next()
          b += n -> o.get(n).get("ceiling_sec").asDouble()
        }
        b.result()
      }

    // warmup: JVM + codegen + parquet reader, same spirit as Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.documents(spark, corpus).count()

    var breaches = List.empty[(String, Double, Double)]
    val results = ops
      .filter { case (n, _) => record || ceilings.contains(n) }
      .map { case (name, op) =>
        val t0 = System.nanoTime()
        val (rows, selfTimed) = op(spark, corpus, baseDir)
        val secs = selfTimed.getOrElse((System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
        CacheScope.drain(spark)
        val status = ceilings.get(name) match {
          case Some(c) if secs > c => breaches ::= (name, secs, c); "BREACH"
          case Some(_) => "ok"
          case None => "recorded"
        }
        println(f"[sentinel] $name%-20s $secs%8.2f s   rows=$rows%-10d $status")
        (name, secs, rows)
      }

    if (record) {
      // print a checked-in-able sentinels.json: ceiling = 1.5x receipt
      val opsJson = results.map { case (n, s, r) =>
        f""""$n": {"receipt_sec": $s%.1f, "ceiling_sec": ${math.ceil(s * 1.5)}%.0f, "rows": $r}"""
      }.mkString(",\n    ")
      println(
        s"""{
           |  "corpus": "$corpus",
           |  "built_from": "$baseDir",
           |  "copies": 100,
           |  "note": "wall-clock ceilings for the 100x scale gate; ceiling = 1.5x receipt. On a breach, re-run once to rule out box load.",
           |  "ops": {
           |    $opsJson
           |  }
           |}""".stripMargin)
    } else {
      val summary = breaches.map { case (n, s, c) =>
        f""""$n": {"sec": $s%.1f, "ceiling_sec": $c%.1f}""" }
        .mkString("{", ",", "}")
      println(s"""{"sentinel":1,"corpus":"$corpus","n_ops":${results.size},"n_breach":${breaches.size},"breaches":$summary}""")
    }
    spark.stop()
    if (breaches.nonEmpty) sys.exit(1)
  }
}
