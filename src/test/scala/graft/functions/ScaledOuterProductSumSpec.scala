package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[ScaledOuterProductSum]] to the declarative per-cell half-up
  * rescale + BIGINT sum it replaced in q_pca_power.
  */
class ScaledOuterProductSumSpec extends SparkSpec {

  import spark.implicits._

  private def declarative(df: org.apache.spark.sql.DataFrame, d: Int) = df
    .select(explode(expr(
      s"""flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(i, ${d - 1}), j -> named_struct(
         |    'c', i * $d + j,
         |    'p', element_at(v6, i + 1) * element_at(v6, j + 1)))))""".stripMargin))
      .as("cell"))
    .select(col("cell.c").as("c"), expr(
      """CASE WHEN cell.p >= 0 THEN (2 * cell.p + 1000000) div 2000000
        |  ELSE -((2 * -cell.p + 1000000) div 2000000) END""".stripMargin).as("s"))
    .groupBy(col("c"))
    .agg(sum(col("s")).as("want"))

  private def native(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val sops = udaf(new ScaledOuterProductSum(d, 1000000L))
    df.agg(sops(col("v6")).as("s"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
           |  transform(sequence(i, ${d - 1}), j -> i * $d + j)))""".stripMargin)).as("c"),
        col("s"))
      .select(col("c"), expr("element_at(s, c + 1)").as("got"))
  }

  test("UDAF scaled cell sums == declarative form on sf0.001 embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> " +
        "CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT))")
        .as("v6"))
      .persist()
    assert(native(e, 64).join(declarative(e, 64), "c")
      .filter(col("got") =!= col("want")).count() == 0)
    e.unpersist()
  }

  test("half-up rescale matches on mixed signs and sub-div magnitudes") {
    val e = Seq(
      Seq(499999L, -500000L, 1500001L),
      Seq(-3L, 7L, -1000001L),
      Seq(0L, 2500000L, -2499999L)).toDF("v6").persist()
    assert(native(e, 3).join(declarative(e, 3), "c")
      .filter(col("got") =!= col("want")).count() == 0)
    e.unpersist()
  }

  test("null and wrong-dimension rows are skipped, not NPE") {
    val agg = new ScaledOuterProductSum(2, 1L)
    val buf = agg.reduce(agg.reduce(agg.zero, Seq(2L, 3L)), null)
    val buf2 = agg.reduce(agg.reduce(buf, Seq(1L)), Seq(1L, 2L, 3L))
    assert(buf2.toSeq == Seq(4L, 6L, 0L, 9L))
  }
}
