package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the identical-sequence collapse in repeatedSpanClean (round 11):
  * on a feed where the same documents recur under many doc_ids, the
  * collapsed q_exact_substr must produce EXACTLY what the uncollapsed
  * per-doc chain produces — including the duplication-count semantics
  * (k identical copies make every window corpus-duplicated, so the
  * copies' tokens are all covered).
  */
class SpanCollapseSpec extends SparkSpec {

  private val dir = "/tmp/span_collapse_spec"

  test("q_exact_substr on a duplicate-heavy feed equals the uncollapsed chain") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (0 to 2).map(k => base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CorpusOpsQueries.qExactSubstr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSet

    // the REPLACED chain, verbatim: per-doc windows, raw counts,
    // per-doc coverage and rebuild
    val n = 5
    val t = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .withColumn("nt", size(col("tk")))
    val sh = t.filter(col("nt") >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.ShinglesExpr.shingles(col("tk"), n, distinct = false))
          .as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("sh"))
      .persist()
    val dup = sh.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("sh"))
    val cov = sh.join(dup, "sh")
      .select(col("doc_id").as("cdoc"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
      .distinct()
      .persist()
    val dupCnt = cov.groupBy(col("cdoc").as("doc_id"))
      .agg(count(lit(1)).as("n_dup_tokens"))
    val tox = t.select(col("doc_id"),
        posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val clean = tox.join(cov,
        col("doc_id") === col("cdoc") && col("p") === col("tp"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"), " ")
        .as("clean_text"))
    val want = t.select(col("doc_id"), col("nt"))
      .join(dupCnt, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("nt").cast("long").as("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).cast("long").as("n_dup_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .select(col("doc_id"), col("n_tokens"), col("n_dup_tokens"),
        round(col("n_dup_tokens").cast("double") / col("n_tokens"), 6).as("dup_frac"),
        md5(col("clean_text")).as("clean_hash"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSet
    sh.unpersist(); cov.unpersist()

    assert(got == want)
    // the duplication semantics bite: replicated copies are covered
    assert(got.exists(_._3 > 0), "replication must produce covered tokens")
    graft.CacheScope.drain(spark)
  }
}
