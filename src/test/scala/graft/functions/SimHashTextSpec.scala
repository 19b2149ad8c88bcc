package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[SimHashTextExpr]] (fused tokenize+hash walk) to the
  * `SimHashExpr(split(trim(text), "\\s+"))` chain it replaced in
  * `simhashSigOver` — per-document, on real corpus text and on the
  * whitespace/unicode/empty edges where the split form's empty-token
  * quirks live.
  */
class SimHashTextSpec extends SparkSpec {

  import spark.implicits._

  private def diffOn(d: org.apache.spark.sql.DataFrame): Long =
    d.select(
        SimHashTextExpr.of(col("text")).as("fused"),
        SimHashExpr.of(split(trim(col("text")), "\\s+")).as("split_form"))
      .filter(!(col("fused") <=> col("split_form")))
      .count()

  test("fused == split chain per document on the sf0.001 corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
    assert(diffOn(d) == 0)
    assert(d.count() > 0)
  }

  test("whitespace/unicode/empty edges") {
    val d = Seq(
      "hello world",
      "  leading and trailing  ",        // trim-visible spaces
      "\ttabs\nandnewlines\r mixed", // \s bytes trim() does NOT strip
      "héllo wörld ≠ ascii",             // multibyte tokens
      "single",
      "a a a a",                         // repeated token
      "",                                // no tokens -> NULL
      " \t\n\r ",            // only whitespace (all 6 \s bytes) -> NULL
      "a  b",                            // collapsed separator run
      "日本語 テキスト"                   // fully multibyte
    ).toDF("text")
    assert(diffOn(d) == 0)
    // the two NULL rows really are NULL (not zero)
    val nulls = d.select(SimHashTextExpr.of(col("text")).as("h"))
      .filter(col("h").isNull).count()
    assert(nulls == 2)
  }

  test("property: fused == split chain on arbitrary whitespace/unicode soup") {
    // generator-backed pin (round 13): the same soup generator caught a
    // real boundary-empty-token divergence in the MinHash fused walk
    // that the corpus and handcrafted edges both missed (Spark's split
    // keeps trailing empty fields — MinHashTextSpec). SimHashExpr SKIPS
    // empty tokens, so here the law pins that the fused walk's
    // never-emits-empties behavior matches on any boundary shape.
    assert(diffOn(GenSoup.sample(GenSoup.textGen).toDF("text")) == 0)
  }
}
