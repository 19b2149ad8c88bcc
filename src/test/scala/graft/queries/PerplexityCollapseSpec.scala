package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Pins the identical-content collapse in q_perplexity (round 11): on a
  * feed where the same documents recur under many doc_ids, the collapsed
  * query must produce EXACTLY what the per-doc chain produces — the
  * weighted training counts shift the smoothed bigram model, so the
  * buckets are not simply scaled.
  */
class PerplexityCollapseSpec extends SparkSpec {

  private val dir = "/tmp/perplexity_collapse_spec"

  test("q_perplexity on a duplicate-heavy feed equals the per-doc chain") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (0 to 2).map(k => base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet

    val got = rows(CurationQueries.qPerplexity(spark, dir))

    // the REPLACED chain, verbatim: per-doc bigrams, raw counts
    val tk = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val big = tk
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
      .persist()
    val cBig = big.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_big"))
    val cCtx = big.groupBy(col("lang"), col("w1"))
      .agg(count(lit(1)).as("c_ctx"))
    val vocab = tk.select(col("lang"), explode(col("t")).as("w"))
      .groupBy(col("lang")).agg(countDistinct(col("w")).as("v"))
    val logp = cBig
      .join(cCtx, Seq("lang", "w1"))
      .join(broadcast(vocab), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"),
        round(log10((col("c_big") + 1).cast("double") / (col("c_ctx") + col("v"))), 6)
          .cast("decimal(28,6)").as("lp"))
    val docBig = big.groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val want = rows(docBig
      .join(broadcast(logp), Seq("lang", "w1", "w2"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lp") * col("cnt")).as("s"), sum(col("cnt")).as("n"))
      .select(col("doc_id"), col("lang"),
        ((-col("s")).cast("double") / col("n")).as("avg_nlp"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("avg_nlp"), col("doc_id"))))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("avg_nlp")), 4).as("min_nlp"),
        round(max(col("avg_nlp")), 4).as("max_nlp")))
    big.unpersist()

    assert(got == want)
    assert(got.nonEmpty)
    graft.CacheScope.drain(spark)
  }
}
