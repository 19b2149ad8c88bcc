package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Semantic pins for the inter-document boilerplate filter beyond the
  * DuckDB oracle gate: the detector must actually FIRE on template
  * families (exact-duplicate clusters big enough to clear the df
  * threshold share every shingle, so every member scores 1.0), and its
  * accounting must be internally consistent.
  */
class BoilerplateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("matches an independent driver-side reference implementation") {
    // 500 docs at sf0.01 — small enough to recompute the whole op in
    // plain Scala collections and demand bit-for-bit agreement with the
    // distributed plan (different code path, same math)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val tk = t.trim.split("\\s+")
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val df = perDoc.values.flatten
      .groupBy(identity).map { case (s, xs) => s -> xs.size }
    val thresh = math.max(4L, math.ceil(docs.size * 0.008).toLong)
    val expected = perDoc.map { case (id, ss) =>
      val common = ss.count(s => df(s) >= thresh)
      val frac = BigDecimal(common.toDouble / ss.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((ss.size.toLong, common.toLong, frac))
    }
    val got = TextQueries.qBoilerplate(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, c, f) = expected(id)
      assert(r.getAs[Long]("n_shingles") == n, s"doc $id n_shingles")
      assert(r.getAs[Long]("n_common") == c, s"doc $id n_common")
      assert(r.getAs[Double]("boiler_frac") == f, s"doc $id frac")
    }
  }

  test("accounting is internally consistent and not degenerate") {
    val rows = TextQueries.qBoilerplate(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val c = r.getAs[Long]("n_common")
      val frac = r.getAs[Double]("boiler_frac")
      val keep = r.getAs[Int]("keep")
      assert(c >= 0 && c <= n)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(keep == (if (frac <= 0.5) 1 else 0))
    }
    // the signal separates: some docs kept, some dropped (otherwise the
    // threshold is degenerate at this SF and the gate proves nothing)
    assert(rows.exists(_.getAs[Int]("keep") == 1))
    assert(rows.exists(_.getAs[Int]("keep") == 0))
  }
}
