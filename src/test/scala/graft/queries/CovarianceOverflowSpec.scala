package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the range-guarded covariance product (round 8): coordinates past
  * the BIGINT-safe bound (|q6| > floor(sqrt(2^63-1))) must promote to
  * decimal and stay EXACT — the silent-wraparound case the ADVICE r7
  * item flagged. Expected values recomputed here with BigInt arithmetic
  * mirroring the documented formula, independent of any SQL engine.
  */
class CovarianceOverflowSpec extends SparkSpec {

  test("q_embed_covariance is exact for coordinates past the BIGINT product range") {
    import spark.implicits._
    // two 64-dim vectors of constant huge magnitude: q6 = 3.5845e9 and
    // -4.00025e9, so every cross product exceeds Long.MaxValue and the
    // decimal branch is the one under test (both floats are exact
    // binary fractions, so round(x, 6) is lossless)
    val dims = 64
    val vecs = Seq(
      (1L, Array.fill(dims)(3584.5f)),
      (2L, Array.fill(dims)(-4000.25f)))
    val dir = java.nio.file.Files.createTempDirectory("cov-overflow").toString
    vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")

    val rows = CorpusOpsQueries.qEmbedCovariance(spark, dir).collect()
    assert(rows.length == dims * (dims + 1) / 2)

    // expected, in exact integer arithmetic per the documented recipe
    def halfUp(num: BigInt, den: BigInt): BigInt =
      if (num >= 0) (2 * num + den) / (2 * den) else -((2 * -num + den) / (2 * den))
    val q6 = Seq(BigInt(3584500000L), BigInt(-4000250000L))
    val n = BigInt(q6.size)
    val m8 = halfUp(q6.map(_ * 100).sum, n)
    val sp12 = q6.map(v => v * v).sum
    val num = sp12 * 10000 - n * m8 * m8
    val expected = halfUp(num, n * BigInt(100000000L))
    // sanity: the per-vector products individually exceed Long range,
    // so a wrapped BIGINT path could not produce this value
    assert(q6.map(v => v * v).forall(_ > BigInt(Long.MaxValue)))
    rows.foreach { r =>
      assert(BigInt(r.getLong(2)) == expected,
        s"cell (${r.getInt(0)},${r.getInt(1)}): got ${r.getLong(2)}, want $expected")
    }
  }
}
