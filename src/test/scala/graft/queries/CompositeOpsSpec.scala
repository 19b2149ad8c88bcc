package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Cross-query consistency pins for the composed round-6 operators:
  * IVF-PQ must agree with the full PQ-ADC scan on everything it returns,
  * hard negatives must respect the label constraint and true ordering,
  * and the outer-join distribution must conserve counts.
  */
class CompositeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_grouping_sets: each grouping set partitions the corpus count") {
    val rows = RelationalQueries.qGroupingSets(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    // (lang) rows: g_lang=0, g_source=1; (source) rows: 1,0; (): 1,1
    val byLang = rows.filter(r => r.getLong(4) == 0L && r.getLong(5) == 1L)
    val bySrc = rows.filter(r => r.getLong(4) == 1L && r.getLong(5) == 0L)
    val grand = rows.filter(r => r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(grand.length == 1 && grand.head.getLong(2) == total)
    assert(byLang.map(_.getLong(2)).sum == total)
    assert(bySrc.map(_.getLong(2)).sum == total)
    assert(byLang.forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    assert(bySrc.forall(r => r.isNullAt(0) && !r.isNullAt(1)))
    assert(rows.length == byLang.length + bySrc.length + 1)
  }

  test("q_inverted_index: postings agree with df, sorted and distinct") {
    val rows = TextQueries.qInvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      assert(df >= 4 && df <= 12)
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(ids.length == df, s"${r.getString(0)}: postings != df")
      assert(ids.sameElements(ids.sorted) && ids.distinct.length == ids.length)
    }
  }

  test("q_profile: PK column profiles as unique, stats parse and order") {
    val rows = LakeOpsQueries.qProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val total = Tables.orders(spark, sf).count()
    assert(rows.keySet == Set("o_orderkey", "o_custkey", "o_orderpriority"))
    rows.values.foreach { r =>
      assert(r.getLong(1) == total && r.getLong(2) == 0L)
    }
    val pk = rows("o_orderkey")
    assert(pk.getLong(3) == total, "order key should profile as unique")
    assert(pk.getString(4).toLong <= pk.getString(5).toLong)
    assert(rows("o_orderpriority").getLong(3) == 5L)
  }

  test("q_set_ops: intersect and except partition the first slice's pairs") {
    val rows = RelationalQueries.qSetOps(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val inter = rows.filter(_._1 == "intersect").map(t => (t._2, t._3)).toSet
    val exc = rows.filter(_._1 == "except").map(t => (t._2, t._3)).toSet
    assert(inter.nonEmpty)
    assert(inter.intersect(exc).isEmpty, "intersect and except overlap")
    val aPairs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).select("lang", "source").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inter.union(exc) == aPairs, "set ops do not partition slice A")
  }

  test("q_unpivot: long form conserves the corpus count over the full grid") {
    val rows = RelationalQueries.qUnpivot(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    val sources = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == 5 * sources, "grid must be sources x 5 langs")
  }

  test("IVF-PQ distances agree with the full ADC scan; pruning only prunes") {
    // full-scan ADC pairs (no IVF pruning): the distance ground truth
    val full = PqQueries.qSimPqTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfpq = PqQueries.qSimIvfPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ivfpq.nonEmpty)
    // any pair IVF-PQ returns that the full top-3 also returns must carry
    // the IDENTICAL ADC distance (same codes, same LUT — pruning must not
    // change arithmetic)
    val overlap = ivfpq.filter { case (q, n, _) => full.contains((q, n)) }
    assert(overlap.nonEmpty, "probe lists should retain some true ADC top-3")
    overlap.foreach { case (q, n, d) => assert(d == full((q, n)), s"($q,$n)") }
  }

  test("hard negatives: label constraint and true top-k ordering hold") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = SimilarityQueries.qHardNegatives(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    for ((q, _, n, _) <- out) assert(labels(q) != labels(n), s"$q vs $n share a label")
    // ranks are dense 1..5 per anchor and cosine is non-increasing in rank
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.size))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4, s"anchor $q not sorted")
        case _ =>
      }
    }
  }

  test("streaming contamination flags a superset of the pairwise gate") {
    // q_decontaminate requires >= 2 shingles shared with ONE benchmark
    // doc; the stream filter counts hits against the benchmark UNION, so
    // every pairwise-flagged doc must also be stream-flagged (never the
    // reverse necessarily)
    val pairwise = PipelineQueries.qDecontaminate(spark, sf)
      .select(col("train_doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val streamed = StreamingQueries.qStreamContam(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(pairwise.nonEmpty && pairwise.subsetOf(streamed))
  }

  test("source similarity: full pair matrix, sketch tracks exact Jaccard") {
    val out = SketchDedupQueries.qSourceSimilarity(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val nSources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count().toInt
    assert(out.length == nSources * (nSources - 1) / 2, "full upper-triangle matrix")
    assert(out.forall { case (_, _, e, j) => e >= 0 && e <= 1 && j >= 0 && j <= 1 })
    // a 16-permutation sketch is coarse (sd ~ sqrt(j(1-j)/16)) but must
    // TRACK the exact values corpus-wide, not wander
    val mae = out.map { case (_, _, e, j) => math.abs(e - j) }.sum / out.length
    assert(mae < 0.25, s"mean |est - jaccard| = $mae")
  }

  test("packing efficiency's analytic counts equal the real span packing") {
    val predicted = CorpusOpsQueries.qPackingEfficiency(spark, sf)
      .filter(col("context_size") === 4096).collect()(0).getLong(1)
    val actual = PipelineQueries.qPackSpans(spark, sf)
      .select(col("lang"), col("shard"), col("seq_id")).distinct().count()
    assert(predicted == actual,
      s"analytic ceil-sum $predicted vs packed sequences $actual")
  }

  test("incremental rollup: replaying a batch is a no-op (idempotent loads)") {
    import org.apache.spark.sql.functions.date_format
    val lake = java.nio.file.Files.createTempDirectory("graft_rollup_spec")
      .resolve("rollup").toString
    val o = Tables.orders(spark, sf)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    RelationalQueries.rollupMergeIn(spark, lake, o.filter(col("o_orderkey") % 2 === 0), "b0")
    RelationalQueries.rollupMergeIn(spark, lake, o.filter(col("o_orderkey") % 2 === 1), "b1")
    val once = RelationalQueries.rollupRead(spark, lake).collect().map(_.toSeq).toSeq
    // replay the second load — partials keyed by batch_id overwrite, not add
    RelationalQueries.rollupMergeIn(spark, lake, o.filter(col("o_orderkey") % 2 === 1), "b1")
    val twice = RelationalQueries.rollupRead(spark, lake).collect().map(_.toSeq).toSeq
    assert(once == twice && once.nonEmpty)
    graft.etl.LakeFs.deleteRecursively(spark,
      new org.apache.hadoop.fs.Path(lake).getParent)
  }

  test("outer-join distribution conserves customers and orders") {
    val out = RelationalQueries.qOuterJoinDist(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(out.map(_._2).sum == nCust, "every customer lands in one bucket")
    assert(out.map { case (c, d) => c * d }.sum == nOrd,
      "order counts are conserved across the histogram")
    assert(out.exists(_._1 == 0L), "zero-order customers only survive an OUTER join")
  }
}
