package graft.queries

import org.apache.spark.sql.functions.{col, countDistinct, count, lit, struct}

import graft.SparkSpec

/** Pins the structural assumption qDedupAgreement's union-tag rewrite
  * rests on: each candidate generator emits DISTINCT (doc_a, doc_b)
  * pairs. The rewrite counts pairs via max-over-tag set membership, so a
  * generator that started emitting duplicate pairs would silently shift
  * n_pairs/n_truth from raw counts to distinct counts — precision/recall
  * would drift with no failure anywhere. This spec makes that regression
  * land HERE instead.
  */
class DedupAgreementSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("each agreement generator emits distinct (doc_a, doc_b) pairs") {
    val generators = Seq(
      "ngram_jaccard (truth)" -> TextQueries.qDedupNgramJaccard(spark, sf),
      "minhash_lsh" -> SketchDedupQueries.qDedupMinhashLsh(spark, sf),
      "simhash" -> SketchDedupQueries.qDedupSimhash(spark, sf))
    generators.foreach { case (name, df) =>
      val Array(total, distinct) = df
        .agg(count(lit(1)).as("n"),
          countDistinct(struct(col("doc_a"), col("doc_b"))).as("d"))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      assert(total > 0, s"$name produced no pairs at sf0.01")
      assert(total == distinct,
        s"$name emits duplicate pairs ($total rows, $distinct distinct) — " +
          "qDedupAgreement's max-over-tag counting is no longer exact")
    }
  }
}
