package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[AHashBandsExpr]] to the declarative aHash chain it
  * replaced in q_phash_neardup: per-character explode → per-segment and
  * global half-up micro-unit means → bit decisions → four 16-bit band
  * words. Identical (band, bv) sets on real corpus text and edges.
  */
class AHashExprSpec extends SparkSpec {

  import spark.implicits._

  private def declarative(d: org.apache.spark.sql.DataFrame) = {
    val px = d
      .select(col("doc_id"), length(col("text")).cast("long").as("n"), col("text"))
      .select(col("doc_id"), col("n"), col("text"),
        explode(expr("sequence(1, CAST(n AS INT))")).as("pos"))
      .select(col("doc_id"), col("n"),
        expr("CAST((CAST(pos AS BIGINT) - 1) * 64 div n AS INT)").as("seg"),
        expr("CAST(ascii(substring(text, pos, 1)) AS BIGINT)").as("code"))
    val segMean = px.groupBy(col("doc_id"), col("seg"))
      .agg(sum(col("code")).as("s"), count(lit(1)).as("c"))
      .select(col("doc_id"), col("seg"),
        expr("(2 * 1000000 * s + c) div (2 * c)").as("m6"))
    val docMean = px.groupBy(col("doc_id"))
      .agg(sum(col("code")).as("s"), count(lit(1)).as("c"))
      .select(col("doc_id"), expr("(2 * 1000000 * s + c) div (2 * c)").as("g6"))
    segMean.join(docMean, "doc_id")
      .select(col("doc_id"), (col("seg") / 16).cast("int").as("band"),
        when(col("m6") > col("g6"),
          expr("CAST(pow(2, seg % 16) AS BIGINT)")).otherwise(lit(0L)).as("bw"))
      .groupBy(col("doc_id"), col("band"))
      .agg(sum(col("bw")).as("bv"))
  }

  private def native(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id"), posexplode(AHashBandsExpr.bands(col("text")))
      .as(Seq("band", "bv")))

  test("native band words == declarative chain on the sf0.001 corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text"))
      .persist()
    val diff = native(d).as("a")
      .join(declarative(d).as("b"), Seq("doc_id", "band"), "full")
      .filter(col("a.bv").isNull || col("b.bv").isNull ||
        col("a.bv") =!= col("b.bv"))
    assert(diff.count() == 0)
    d.unpersist()
  }

  test("empty input returns the all-zero degenerate grid (no div-by-zero)") {
    val bands = AHashBandsExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(""))
    assert(bands.array.toSeq == Seq(0L, 0L, 0L, 0L))
    // and through the expression path end-to-end
    val out = Seq((1L, "")).toDF("doc_id", "text")
      .select(AHashBandsExpr.bands(col("text")).as("b"))
      .collect()
    assert(out.head.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L))
  }

  test("native == declarative on unicode and boundary shapes") {
    val d = Seq(
      (1L, "x" * 64),                                     // minimal grid
      (2L, ("héllo wörld ü " * 8).take(100)),             // multibyte
      (3L, (0 until 200).map(i => ('A' + i % 26).toChar).mkString),
      (4L, "a" * 63 + "Z" * 64)                           // bimodal
    ).toDF("doc_id", "text").filter(length(col("text")) >= 64).persist()
    val diff = native(d).as("a")
      .join(declarative(d).as("b"), Seq("doc_id", "band"), "full")
      .filter(col("a.bv").isNull || col("b.bv").isNull ||
        col("a.bv") =!= col("b.bv"))
    assert(diff.count() == 0)
    d.unpersist()
  }

  test("property: native == declarative on generated character soup") {
    // GenSoup discipline (round 13): dense printable/whitespace/multibyte
    // soup crossing the 64-sample floor — segment boundaries land on
    // arbitrary codepoints
    val d = GenSoup.sample(GenSoup.charSoupGen, n = 24).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .filter(length(col("text")) >= 64).persist()
    val diff = native(d).as("a")
      .join(declarative(d).as("b"), Seq("doc_id", "band"), "full")
      .filter(col("a.bv").isNull || col("b.bv").isNull ||
        col("a.bv") =!= col("b.bv"))
    assert(diff.count() == 0)
    d.unpersist()
  }
}
