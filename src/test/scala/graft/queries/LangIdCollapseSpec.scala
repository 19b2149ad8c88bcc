package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.functions.CharNgramCountsExpr

/** Pins the identical-content collapse in q_langid_nb / q_lm_quality
  * (round 11): on a feed where the same documents recur under many
  * doc_ids, the collapsed queries must produce EXACTLY what the per-doc
  * chain produces — including the training-count weighting (k copies
  * contribute k× their trigram counts, which moves the smoothed model,
  * so the matrix is NOT simply k× the base corpus's).
  */
class LangIdCollapseSpec extends SparkSpec {

  private val dir = "/tmp/langid_collapse_spec"

  private def writeCorpus(): Unit = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (0 to 2).map(k => base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** The replaced per-doc chain, shared prefix: gram maps per DOC, raw
    * training counts, smoothed log-prob map per gram.
    */
  private def perDocModel() = {
    val gmap = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        CharNgramCountsExpr.charNgramCounts(
          substring(lower(col("text")), 1, 200)).as("gm"))
      .filter(size(col("gm")) > 0)
      .persist()
    val cGl = gmap
      .select(col("lang").as("l"), explode(col("gm")).as(Seq("g", "cnt")))
      .groupBy(col("l"), col("g")).agg(sum(col("cnt")).as("c_gl"))
    val cL = cGl.groupBy(col("l")).agg(sum(col("c_gl")).as("c_l"))
    val vocab = cGl.select(col("g")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    (gmap, cGl, cL, vocab, vSize)
  }

  test("q_langid_nb collapsed == per-doc chain on a duplicate-heavy feed") {
    writeCorpus()
    val got = matrixSet(TextQueries.qLangIdNb(spark, dir))

    val (gmap, cGl, cL, vocab, vSize) = perDocModel()
    val logp = vocab
      .join(broadcast(cL), lit(true))
      .join(broadcast(vSize), lit(true))
      .join(cGl, Seq("g", "l"), "left")
      .select(col("g"), col("l"),
        round(log10((coalesce(col("c_gl"), lit(0L)) + 1).cast("double") /
          (col("c_l") + col("v"))), 6).cast("decimal(28,6)").as("lp"))
    val want = gmap
      .select(col("doc_id"), col("lang"), explode(col("gm")).as(Seq("g", "cnt")))
      .join(broadcast(logp), "g")
      .groupBy(col("doc_id"), col("lang"), col("l"))
      .agg(sum(col("lp") * col("cnt")).as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("l"))))
      .filter(col("rk") === 1)
      .groupBy(col("lang"), col("l").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
    gmap.unpersist()
    assert(got == matrixSet(want))
    assert(got.nonEmpty)
    graft.CacheScope.drain(spark)
  }

  test("q_lm_quality collapsed == per-doc chain on a duplicate-heavy feed") {
    writeCorpus()
    val got = TextQueries.qLmQuality(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val (gmap, cGl, cL, _, vSize) = perDocModel()
    val logp = cGl
      .join(broadcast(cL), "l")
      .join(broadcast(vSize))
      .select(col("g"), col("l"),
        round(log10((col("c_gl") + 1).cast("double") / (col("c_l") + col("v"))), 6)
          .cast("decimal(28,6)").as("lp"))
    val want = gmap
      .select(col("doc_id"), col("lang"), explode(col("gm")).as(Seq("g", "cnt")))
      .join(broadcast(logp.withColumnRenamed("g", "lg")),
        col("g") === col("lg") && col("lang") === col("l"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lp") * col("cnt")).as("total"), sum(col("cnt")).as("n"))
      .select(col("doc_id"), col("lang"),
        round(col("total").cast("double") / col("n"), 5).as("avg_logp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("avg_logp"), col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("doc_id"), col("avg_logp"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    gmap.unpersist()
    assert(got == want)
    assert(got.nonEmpty)
    graft.CacheScope.drain(spark)
  }

  test("q_langid_nb on a trigram-free corpus is an empty matrix, not a crash") {
    // every truncated text <3 chars: no trigrams, no language inventory
    // (ADVICE r11: the generated score columns would otherwise leave
    // scoreCols.head/greatest to throw at plan-build time)
    val d = "/tmp/langid_empty_spec"
    spark.createDataFrame(Seq((1L, "en", "ab"), (2L, "de", ""), (3L, "es", "y")))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextQueries.qLangIdNb(spark, d)
    assert(out.columns.toSeq == Seq("lang", "predicted", "n_docs"))
    assert(out.count() == 0)
    graft.CacheScope.drain(spark)
  }

  /** (lang, predicted, n_docs) set of a confusion-matrix frame. */
  private def matrixSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
}
