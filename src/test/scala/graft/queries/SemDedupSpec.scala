package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** SemDeDup semantics: every dropped vector must name a keeper with a
  * LOWER vec_id, and the claimed cosine must be a genuine near-dup
  * similarity — re-derived here from the raw parquet in plain Scala, not
  * through any query-side code path.
  */
class SemDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dropped rows point at a lower-id keeper above the threshold") {
    val rows = SimilarityQueries.qSemDedup(spark, sf).collect()
    assert(rows.nonEmpty, "SemDeDup found no near-duplicates at sf0.01")
    rows.foreach { r =>
      val (vecId, dupOf, cos) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dupOf < vecId, s"keeper $dupOf is not lower-id than $vecId")
      assert(cos >= 0.35, s"pair ($dupOf, $vecId) below threshold: $cos")
    }
    // one drop row per vector, never two keepers for the same vec_id
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
  }

  test("claimed cosines match an independent recomputation from raw parquet") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dotAb, na, nb = 0.0
      var i = 0
      while (i < a.length) { dotAb += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dotAb / (math.sqrt(na) * math.sqrt(nb))
    }
    SimilarityQueries.qSemDedup(spark, sf).collect().foreach { r =>
      val expected = cosine(vecs(r.getLong(1)), vecs(r.getLong(2)))
      assert(math.abs(expected - r.getDouble(3)) < 1e-4,
        s"cosine mismatch for (${r.getLong(2)}, ${r.getLong(1)}): " +
          s"query ${r.getDouble(3)} vs recomputed $expected")
    }
  }
}
