package graft.queries

import graft.SparkSpec

/** ANN quality accounting: recall@3 of the IVF search against the exact
  * brute-force top-3 on the shared query set. Training the coarse
  * quantizer (Lloyd iterations) must not LOSE recall versus the
  * sampled-centroid start — tighter lists put true neighbors in the same
  * list as their query more often, never less (on this data; asserted,
  * not assumed).
  */
class IvfRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def exactTop3: Map[Long, Set[Long]] =
    SimilarityQueries.qSimCosineTopk(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt3(
      iters: Int, nprobe: Int, truth: Map[Long, Set[Long]]): Double = {
    val got = SimilarityQueries.qSimIvfWith(iters, nprobe)(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // queries missing from the IVF result (empty list) score 0
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
  }

  test("trained IVF (2 Lloyd iterations) recall@3 >= sampled-centroid recall@3") {
    val truth = exactTop3
    assert(truth.nonEmpty)
    val sampled = recallAt3(0, 1, truth)
    val trained = recallAt3(2, 1, truth)
    info(f"recall@3 sampled=$sampled%.3f trained=$trained%.3f")
    assert(trained >= sampled, f"training lost recall: $trained%.3f < $sampled%.3f")
    assert(trained > 0.0)
  }

  test("multi-probe (nprobe=2) recall@3 >= single-probe recall@3") {
    val truth = exactTop3
    val single = recallAt3(2, 1, truth)
    val multi = recallAt3(2, 2, truth)
    info(f"recall@3 nprobe=1 $single%.3f nprobe=2 $multi%.3f")
    // strict monotonicity is not guaranteed under rank ties: at round-5
    // cosine resolution a second-probe candidate TIED with a true neighbor
    // but with a lower neighbor_id can displace it from the top-3, so allow
    // one displaced neighbor of slack (1 neighbor / (3 * |queries|))
    val eps = 1.0 / (3.0 * truth.size)
    assert(multi >= single - eps,
      f"multi-probe lost recall beyond tie slack: $multi%.3f < $single%.3f - $eps%.4f")
  }
}
