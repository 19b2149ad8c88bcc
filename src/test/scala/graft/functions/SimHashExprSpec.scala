package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[SimHashExpr]] to the declarative chain it replaced
  * in SketchDedupQueries.simhashSigOver: explode every token, filter
  * empties, [[Md5Hash60Expr]] per token, [[SignedBitSum]] aggregate,
  * then fold the 60 signed sums into fingerprint bits — identical
  * 60-bit value per document, and NULL exactly for the documents the
  * exploded form drops (no non-empty token).
  */
class SimHashExprSpec extends SparkSpec {

  private val Bits = 60

  private def declarative(docs: org.apache.spark.sql.DataFrame) =
    declarativeArr(docs.select(
      col("doc_id"), split(trim(col("text")), "\\s+").as("tk")))

  private def declarativeArr(docs: org.apache.spark.sql.DataFrame) = {
    val tokens = docs
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("hx", Md5Hash60Expr.of(col("tok")))
    val bitSum = udaf(new SignedBitSum(Bits))
    val fpExpr = expr(
      s"""aggregate(sequence(0, ${Bits - 1}), CAST(0 AS BIGINT),
         |  (acc, j) -> acc + CASE WHEN element_at(s, j + 1) > 0
         |    THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)""".stripMargin)
      .as("want")
    tokens.groupBy(col("doc_id")).agg(bitSum(col("hx")).as("s"))
      .select(col("doc_id"), fpExpr)
  }

  private def native(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"),
      SimHashExpr.of(split(trim(col("text")), "\\s+")).as("got"))
    .filter(col("got").isNotNull)

  test("native fingerprint == explode + SignedBitSum chain on the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val diff = native(docs).join(declarative(docs), Seq("doc_id"), "full")
      .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
    assert(diff.count() == 0)
  }

  test("edge rows: empty / whitespace-only text is NULL, unicode and single tokens match") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "one"), (4L, "a b a b a"),
      (5L, "héllo wörld héllo"), (6L, "日本語 トークン"), (7L, "x\ty \n z")
    ).toDF("doc_id", "text")
    val got = native(docs)
    val want = declarative(docs)
    // the exploded chain drops docs 1 and 2; the native form nulls them
    assert(got.select(col("doc_id")).as[Long].collect().sorted
      === Array(3L, 4L, 5L, 6L, 7L))
    val diff = got.join(want, Seq("doc_id"), "full")
      .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
    assert(diff.count() == 0)
  }

  test("property: native == explode chain on generated soup texts") {
    import spark.implicits._
    // GenSoup discipline (round 13): the corpus pin and oracle both
    // missed a fused-walk boundary divergence once; seeded soup is the
    // standing guard for trim/split boundary semantics
    val docs = GenSoup.sample(GenSoup.textGen, seedBase = 0x5177).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val diff = native(docs).join(declarative(docs), Seq("doc_id"), "full")
      .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
    assert(diff.count() == 0)
    // the law is vacuous unless some generated docs carry tokens
    assert(native(docs).count() > 0)
  }

  test("property: native == explode chain on generated token arrays (empties mid-array)") {
    import spark.implicits._
    // arrays passed directly can hold shapes split never emits — empty
    // strings in the MIDDLE — which the native walk must skip exactly
    // like the exploded filter does
    val rows = GenSoup.sample(GenSoup.tokenArrayGen, seedBase = 0x51AB).zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("doc_id", "tk")
    val got = rows
      .select(col("doc_id"), SimHashExpr.of(col("tk")).as("got"))
      .filter(col("got").isNotNull)
    val diff = got.join(declarativeArr(rows), Seq("doc_id"), "full")
      .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
    assert(diff.count() == 0)
    assert(got.count() > 0)
  }
}
