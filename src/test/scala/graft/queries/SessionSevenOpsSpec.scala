package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants the DuckDB oracle can't see for the seventh-session
  * operators: attribution credit conservation, the contribution cap's
  * sensitivity bound, PCA's eigenvector property against a driver-side
  * double reference, label-noise flagging on a planted corruption, and
  * the perceptual hash's locality (identical payload -> Hamming 0,
  * small perturbation -> small distance).
  */
class SessionSevenOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("attribution conserves linear credit and first/last totals") {
    val out = AnalyticsQueries.qAttribution(spark, sf).collect()
    val byCh = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val firstTotal = byCh.values.map(_._1).sum
    val lastTotal = byCh.values.map(_._2).sum
    // every purchase is attributed exactly once in the first-touch view
    // and once in the last-touch view (direct included)
    assert(firstTotal == purchases)
    assert(lastTotal == purchases)
    // linear credit: 1e6 ppm per conversion, minus at most (n_t - 1)
    // integer-truncation ppm each; never over-allocated
    val linTotal = byCh.values.map(_._3).sum
    assert(linTotal <= purchases * 1000000L)
    assert(linTotal >= purchases * 1000000L - purchases * 10L)
    // the direct bucket only carries full credits
    assert(byCh("(direct)")._3 == byCh("(direct)")._1 * 1000000L)
  }

  test("contribution cap bounds any single user's daily contribution") {
    val out = AnalyticsQueries.qContribCap(spark, sf)
    val bad = out.filter(col("capped_events") > col("users") * 3).count()
    assert(bad == 0)
    // raw >= capped always, and clipping is reported iff raw > capped
    assert(out.filter(col("raw_events") < col("capped_events")).count() == 0)
    assert(out.filter(col("clipped_ppm") > 0 &&
      col("raw_events") === col("capped_events")).count() == 0)
  }

  test("power-iteration PCA aligns with a driver-side double reference") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = 64
    val n = vecs.length.toDouble
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    def iterate(rounds: Int): Array[Double] = {
      var v = Array.fill(d)(1.0)
      for (_ <- 1 to rounds) {
        val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
        val m = w.map(math.abs).max
        v = w.map(_ / m)
      }
      v
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dotAb = a.zip(b).map { case (x, y) => x * y }.sum
      dotAb / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val got = CorpusOpsQueries.qPcaPower(spark, sf).collect()
      .map(r => r.getLong(1).toDouble / 1e6)
    // integer micro-unit fidelity: the 5 exact rounds track the same 5
    // double rounds to quantization error
    val same = cos(got, iterate(5))
    assert(same > 0.999, s"cosine to 5-round double reference = $same")
    // and the iteration makes real progress toward the converged
    // dominant eigenvector relative to the uniform start
    val converged = iterate(200)
    assert(math.abs(cos(got, converged)) >
      math.abs(cos(Array.fill(d)(1.0), converged)),
      "5 rounds no closer to the dominant eigenvector than the start")
  }

  test("kNN label noise flags a planted corruption") {
    import spark.implicits._
    // 40 vectors in two tight, well-separated clusters; one vector in
    // cluster 0 carries cluster 1's label — the planted annotation error
    val rows = (0 until 40).map { i =>
      val cluster = i % 2
      val base = if (cluster == 0) 1.0 else -1.0
      val v = Array.tabulate(8)(k => (base + 0.001 * ((i * 7 + k) % 5)).toFloat)
      val label = if (i == 6) 1 else cluster
      (i.toLong, v, label)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("knn-noise").toString
    // pad to 64 dims (the query's bucket uses the first 8 signs)
    df.select(col("vec_id"),
        expr("concat(transform(embedding, x -> CAST(x AS FLOAT)), array_repeat(CAST(0.0 AS FLOAT), 56))").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.qKnnLabelNoise(spark, dir).collect()
    val flagged = out.map(_.getLong(0)).toSet
    assert(flagged.contains(6L), s"planted noisy vec 6 not flagged: $flagged")
    // clean vectors of cluster 0 must NOT be flagged (their neighbors
    // agree); vec 6's majority must be its true cluster's label
    val v6 = out.find(_.getLong(0) == 6L).get
    assert(v6.getInt(2) == 0)
    assert(out.count(r => r.getLong(0) % 2 == 0 && r.getLong(0) != 6L) == 0)
  }

  test("perceptual hash: identical payloads collide at Hamming 0, near at <= 3") {
    val out = MultimodalQueries.qPhashNeardup(spark, sf).collect()
    assert(out.nonEmpty)
    val twins = out.filter(r =>
      r.getLong(0) < 10000000L && r.getLong(1) == r.getLong(0) + 10000000L)
    // every planted identical-payload twin is found, at distance exactly 0
    val expected = graft.Tables.documents(spark, sf)
      .filter(length(col("text")) >= 64 && col("doc_id") % 25 === 0).count()
    assert(twins.length == expected)
    assert(twins.forall(_.getLong(2) == 0L))
    // everything reported respects the (banding-lossless) threshold
    assert(out.forall(_.getLong(2) <= 3L))
  }

  test("RAKE: multi-word-phrase members outscore isolated frequent words") {
    val out = TextQueries.qRakeKeywords(spark, sf).collect()
    assert(out.length == 20)
    // score = 1e6 * degree div freq >= 1e6 (a word's phrase always
    // contains at least itself)
    assert(out.forall(_.getLong(3) >= 1000000L))
    // degree >= freq by construction
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)))
  }
}
