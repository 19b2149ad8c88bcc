package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[CharNgramsExpr]] to the declarative
  * `transform(sequence(1, greatest(length(s)-2, 0)), i -> substring(s, i, 3))`
  * idiom it replaced in q_langid_nb / q_lm_quality: identical gram arrays
  * (order included) on every real doc, and the oracle's
  * `generate_series` semantics (empty) on strings shorter than n — where
  * the old HOF's descending `sequence(1, 0)` emitted two junk sub-grams
  * DuckDB never produces.
  */
class CharNgramsExprSpec extends SparkSpec {

  import spark.implicits._

  private val hof = expr(
    """transform(sequence(1, greatest(length(s) - 2, 0)),
      |  i -> substring(s, i, 3))""".stripMargin)

  test("native trigrams == HOF on the sf0.001 corpus (lowered, truncated)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(substring(lower(col("text")), 1, 200).as("s"))
      .filter(length(col("s")) >= 3)
    val diff = docs
      .select(CharNgramsExpr.charNgrams(col("s")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
    val first = docs.select(CharNgramsExpr.charNgrams(col("s"))).head().getSeq[String](0)
    assert(first.nonEmpty && first.forall(_.length == 3))
  }

  test("native trigrams == HOF on unicode and boundary shapes") {
    val docs = Seq("abc", "abcd", "héllo wörld", "ééé", "aaaa")
      .toDF("s")
    assert(docs.select(CharNgramsExpr.charNgrams(col("s")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
    // codepoint (not byte) windows: 3-char grams of a multibyte string
    val uni = Seq("héllö").toDF("s")
      .select(CharNgramsExpr.charNgrams(col("s"))).head().getSeq[String](0)
    assert(uni == Seq("hél", "éll", "llö"))
  }

  test("strings shorter than n yield an empty array (oracle generate_series semantics)") {
    val out = Seq("", "a", "ab").toDF("s")
      .select(CharNgramsExpr.charNgrams(col("s")).as("g"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("property: native == HOF on generated soup (dense chars and ws-separated)") {
    // GenSoup discipline (round 13): dense printable/whitespace/multibyte
    // soup plus short whitespace-heavy texts — grams spanning separator
    // runs and codepoint boundaries
    val soup = GenSoup.sample(GenSoup.charSoupGen, n = 24, seedBase = 0x1111) ++
      GenSoup.sample(GenSoup.textGen, n = 24, seedBase = 0x1112)
    val d = soup.toDF("s")
    assert(d.select(CharNgramsExpr.charNgrams(col("s")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
  }
}
