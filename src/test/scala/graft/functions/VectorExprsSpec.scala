package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExprs.dot

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dot matches the aggregate/zip_with fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val got = df.select(
      dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        .as("ref"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got(0).getDouble(0) == 32.0)
  }

  test("dot is null-safe and codegen-correct over many rows") {
    val df = spark.range(10000)
      .select(expr("transform(sequence(0, 15), i -> CAST(id * i AS DOUBLE))").as("a"))
      .withColumn("b", expr("transform(sequence(0, 15), i -> CAST(2.0 AS DOUBLE))"))
    // sum over i of id*i*2 = 2*id*120
    val bad = df.select((dot(col("a"), col("b")) =!=
      col("a").getItem(1) * 240).as("mismatch")) // a[1] = id
      .filter(col("mismatch")).count()
    assert(bad == 0)
    val withNull = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("property: dot and l2sq match their declarative folds on generated vectors") {
    // GenSoup discipline (round 13): mixed signs, ±0.0, 1e±12 magnitudes —
    // the folds must be bit-identical left-to-right, so summation-order
    // sensitivity is the point, not a hazard. Also the first direct pin
    // of L2Squared (previously covered only through the PQ-query oracles).
    val pairs = GenSoup.sample(GenSoup.vecPairGen, seedBase = 0xD07)
    val df = pairs.toDF("a", "b")
    val dotDiff = df.select(
        dot(col("a"), col("b")).as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(dotDiff == 0)
    val l2Diff = df.select(
        VectorExprs.l2sq(col("a"), col("b")).as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(l2Diff == 0)
  }

  test("mismatched lengths dot the common prefix (documented contract)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).head().getDouble(0) == 50.0)
    assert(df.select(VectorExprs.l2sq(col("a"), col("b"))).head().getDouble(0) == 405.0)
  }

  test("dot_product registered for SQL") {
    VectorExprs.register(spark)
    val r = sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
  }
}
