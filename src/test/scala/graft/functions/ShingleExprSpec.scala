package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[ShinglesExpr]] to the declarative
  * `array_distinct(transform(...))` idiom it replaced at 16 call sites:
  * same shingle ARRAY (element order included — array_distinct keeps
  * first occurrence and the expression must too) on real corpus text
  * and adversarial shapes.
  */
class ShingleExprSpec extends SparkSpec {

  import spark.implicits._

  private val hof = expr(
    "array_distinct(transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))")

  test("native shingles == HOF array_distinct(transform(...)) on the sf0.001 corpus") {
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
    val diff = toks
      .select(ShinglesExpr.shingles(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
    assert(toks.select(ShinglesExpr.shingles(col("tk"))).head().getSeq[String](0).nonEmpty)
  }

  test("native shingles == HOF on edge shapes; non-distinct keeps every window") {
    val docs = Seq(
      Tuple1("a b c"),                       // exactly one window
      Tuple1("a b c d"),
      Tuple1("x x x x x x"),                 // all windows identical
      Tuple1("héllo wörld ünïcode zeta éta"),
      Tuple1((1 to 50).map(i => s"t${i % 7}").mkString(" "))) // repeats
      .toDF("text")
      .select(split(col("text"), " ").as("tk"))
    assert(docs.select(ShinglesExpr.shingles(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
    val all = docs.select(ShinglesExpr.shingles(col("tk"), 3, distinct = false).as("a"),
      size(col("tk")).as("n")).collect()
    all.foreach(r => assert(r.getSeq[String](0).size == r.getInt(1) - 2))
  }

  test("size(tk) < k yields an empty array (callers pre-filter)") {
    val out = Seq(Tuple1(Seq("a", "b"))).toDF("tk")
      .select(ShinglesExpr.shingles(col("tk"))).head().getSeq[String](0)
    assert(out.isEmpty)
  }

  test("property: native == HOF on generated token arrays (empties, dups)") {
    // GenSoup discipline (round 13): arrays include empty-string tokens
    // (split's boundary fields) and heavy duplicates — the shapes where
    // first-occurrence dedup order and separator handling can diverge
    val arrays = GenSoup.sample(GenSoup.tokenArrayGen).filter(_.size >= 3)
    assert(arrays.nonEmpty)
    val d = arrays.map(Tuple1(_)).toDF("tk")
    assert(d.select(ShinglesExpr.shingles(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
    // non-distinct form: every window, in order
    val all = d.select(
        ShinglesExpr.shingles(col("tk"), 3, distinct = false).as("a"),
        expr("transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))").as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(all == 0)
  }
}
