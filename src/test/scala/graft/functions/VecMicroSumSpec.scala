package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[VecMicroSum]]-based centroid means to the declarative
  * posexplode → groupBy(cid, pos) → sum(DECIMAL) chain it replaced in
  * ivfCentroids — on real corpus embeddings and on group shapes the
  * aggregate must handle (single-row groups, null vectors,
  * wrong-dimension rows skipped from both the sums and the count).
  */
class VecMicroSumSpec extends SparkSpec {

  private def declarative(df: org.apache.spark.sql.DataFrame) = df
    .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
    .groupBy(col("cid"), col("pos"))
    .agg(sum(expr("CAST(round(x, 6) AS DECIMAL(28,6))")).as("sx"),
      count(lit(1)).as("n"))
    .withColumn("cx", round(col("sx").cast("double") / col("n"), 6))
    .groupBy(col("cid"))
    .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), s -> s.cx)")
      .as("cv"))

  private def native(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val vms = udaf(new VecMicroSum(d))
    df.groupBy(col("cid"))
      .agg(vms(col("v")).as("s"))
      .select(col("cid"),
        expr("transform(s._1, sx -> round(CAST(sx AS DOUBLE) / s._2, 6))").as("cv"))
  }

  test("centroid means match the declarative per-pos chain on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select((col("vec_id") % 7).as("cid"),
        col("embedding").cast("array<double>").as("v"))
    val want = declarative(e).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val got = native(e, 64).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet === want.keySet)
    for ((k, w) <- want) assert(got(k) === w, s"cid $k")
  }

  test("adversarial values: negatives, half-up boundaries, single-row groups") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq(0.0000005, -0.0000005, 1.9999995, -2.5, 0.1)),
      (0L, Seq(-1.0, 2.0, -3.0000004, 4.00000051, -0.0000004)),
      (1L, Seq(123.456789, -0.000001, 0.0, 99.9999994, -99.9999995)))
    val df = rows.toDF("cid", "v")
    val want = declarative(df).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val got = native(df, 5).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got === want)
  }

  test("null and wrong-dimension rows are skipped from sums AND the count") {
    import spark.implicits._
    val df = Seq(
      (0L, Option(Seq(1.0, 2.0))),
      (0L, Option(Seq(3.0, 4.0))),
      (0L, None),                       // null vector: skipped
      (0L, Option(Seq(9.0))))           // wrong dimension: skipped
      .toDF("cid", "v")
    val got = native(df, 2).collect()
    assert(got.length === 1)
    // mean over exactly the two valid rows: (2.0, 3.0)
    assert(got.head.getSeq[Double](1) === Seq(2.0, 3.0))
  }
}
