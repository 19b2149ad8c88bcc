package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the 128-bit [[OuterProductSum]] aggregate to the declarative
  * DECIMAL(38,0) cell sums it replaced in q_embed_covariance — on real
  * embeddings and on adversarial vectors (signs, magnitudes past the
  * 63-bit product bound, sums past the 64-bit accumulator word).
  */
class OuterProductSumSpec extends SparkSpec {

  import spark.implicits._

  private val toDec =
    """CAST(hi AS DECIMAL(38,0)) * CAST('18446744073709551616' AS DECIMAL(20,0))
      | + CASE WHEN lo >= 0 THEN CAST(lo AS DECIMAL(38,0))
      |   ELSE CAST(lo AS DECIMAL(38,0))
      |        + CAST('18446744073709551616' AS DECIMAL(20,0)) END""".stripMargin

  private def declarative(df: org.apache.spark.sql.DataFrame, d: Int) = df
    .select(explode(expr(
      s"""flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(i, ${d - 1}), j -> named_struct(
         |    'c', i * $d + j,
         |    's', CAST(element_at(v6, i + 1) AS DECIMAL(38,0)) * element_at(v6, j + 1)))))""".stripMargin))
      .as("cell"))
    .groupBy(col("cell.c").as("c"))
    .agg(sum(col("cell.s")).as("want"))

  private def native(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val ops = udaf(new OuterProductSum(d))
    df.agg(ops(col("v6")).as("hl"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
           |  transform(sequence(i, ${d - 1}), j -> i * $d + j)))""".stripMargin)).as("c"),
        col("hl"))
      .select(col("c"),
        expr("element_at(hl, c * 2 + 1)").as("hi"),
        expr("element_at(hl, c * 2 + 2)").as("lo"))
      .select(col("c"), expr(toDec).as("got"))
  }

  test("UDAF cell sums == declarative decimal sums on sf0.001 embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> " +
        "CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT))")
        .as("v6"))
      .persist()
    val diff = native(e, 64).join(declarative(e, 64), "c")
      .filter(col("got") =!= col("want"))
    assert(diff.count() == 0)
    e.unpersist()
  }

  test("exact past the 63-bit product and 64-bit sum bounds, signs included") {
    // coordinates ~3.1e9 (past floor(sqrt(2^63-1))) with mixed signs;
    // 2000 rows push single-cell sums past 9.6e18 > Long.MaxValue
    val e = spark.range(2000).select(expr(
      """transform(sequence(0, 2), k ->
        |  CASE WHEN (id + k) % 3 = 0 THEN -3100000000L + id
        |       ELSE 3100000000L + 7 * id + k END)""".stripMargin).as("v6"))
      .persist()
    val joined = native(e, 3).join(declarative(e, 3), "c")
    assert(joined.count() == 6) // d=3 upper triangle
    assert(joined.filter(col("got") =!= col("want")).count() == 0)
    e.unpersist()
  }

  test("null and wrong-dimension rows are skipped, not NPE") {
    val agg = new OuterProductSum(2)
    val buf = agg.reduce(agg.reduce(agg.zero, Seq(2L, 3L)), null)
    val buf2 = agg.reduce(agg.reduce(buf, Seq(1L)), Seq(1L, 2L, 3L))
    // only the one valid row contributed: cells (2·2, 2·3, 3·3)
    assert(buf2.toSeq == Seq(0L, 4L, 0L, 6L, 0L, 0L, 0L, 9L))
    // and through the DataFrame path with an actual null array row
    val d = Seq(Some(Seq(2L, 3L)), None, Some(Seq(1L)))
      .toDF("v6")
    val ops = udaf(new OuterProductSum(2))
    val hl = d.agg(ops(col("v6"))).collect().head.getSeq[Long](0)
    assert(hl == Seq(0L, 4L, 0L, 6L, 0L, 0L, 0L, 9L))
  }
}
