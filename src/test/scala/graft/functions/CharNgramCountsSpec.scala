package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[CharNgramCountsExpr]] to the exploded-gram groupBy counts it
  * replaced in q_langid_nb / q_lm_quality: exploding the count map must
  * yield exactly the (gram, count) rows of counting CharNgramsExpr's
  * instances — on real corpus text and on multibyte/boundary shapes.
  */
class CharNgramCountsSpec extends SparkSpec {

  import spark.implicits._

  private def diffOn(d: org.apache.spark.sql.DataFrame): Long = {
    val fromMap = d.select(col("doc_id"),
        explode(CharNgramCountsExpr.charNgramCounts(col("s"))).as(Seq("g", "cnt")))
    val fromInstances = d.select(col("doc_id"),
        explode(CharNgramsExpr.charNgrams(col("s"))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    fromMap.join(fromInstances, Seq("doc_id", "g"), "full")
      .filter(fromMap("cnt").isNull || fromInstances("cnt").isNull ||
        fromMap("cnt") =!= fromInstances("cnt"))
      .count()
  }

  test("count map == exploded-instance counts on the sf0.001 corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), substring(lower(col("text")), 1, 200).as("s"))
    assert(diffOn(d) == 0)
  }

  test("multibyte and boundary shapes; short strings give the empty map") {
    val d = Seq(
      (1L, "héllo wörld héllo"), // repeated multibyte grams
      (2L, "abc"),               // exactly n
      (3L, "aaaaaa"),            // one gram, count 4
      (4L, "ab"),                // shorter than n
      (5L, "")                   // empty
    ).toDF("doc_id", "s")
    assert(diffOn(d) == 0)
    val sizes = d.select(col("doc_id"),
        size(CharNgramCountsExpr.charNgramCounts(col("s"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes(4L) == 0 && sizes(5L) == 0)
    assert(sizes(3L) == 1)
    // total instances preserved: Σ counts == #grams
    val tot = d.select(
      coalesce(aggregate(map_values(
        CharNgramCountsExpr.charNgramCounts(col("s"))),
        lit(0L), (a, x) => a + x), lit(0L)).as("t"),
      size(CharNgramsExpr.charNgrams(col("s"))).cast("long").as("w"))
    assert(tot.filter(col("t") =!= col("w")).count() == 0)
  }

  test("property: count map == instance counts on generated soup text") {
    // GenSoup discipline (round 13): whitespace runs and multibyte chars
    // at arbitrary boundaries
    val d = GenSoup.sample(GenSoup.textGen).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "s")
    assert(diffOn(d) == 0)
  }
}
