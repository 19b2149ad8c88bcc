package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** The Bloom semi-join reducer's contract: zero false negatives (the
  * correctness half — a miss here silently drops contaminated docs) and
  * a real rejection rate on non-members (the efficiency half — a filter
  * that passes everything just adds work before the shuffle).
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def shingled = Tables.documents(spark, sf)
    .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
    .filter(size(col("tk")) >= 3)
    .select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
      .as("shingle"))

  test("no false negatives: every build key passes its own filter") {
    val bench = shingled.filter(col("doc_id") % 97 === 0).select("shingle")
    val bloom = Bloom.build(bench, "shingle")
    val missed = bench.crossJoin(broadcast(bloom))
      .filter(!Bloom.mightContain(col("shingle"), col("bloom_bits")))
      .count()
    assert(missed == 0L, s"$missed build keys missed their own filter")
  }

  test("pre-filter rejects most non-member shingles at this build size") {
    val bench = shingled.filter(col("doc_id") % 97 === 0).select("shingle")
    val train = shingled.filter(col("doc_id") % 97 =!= 0)
    val bloom = Bloom.build(bench, "shingle")
    val total = train.count()
    val pass = train.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("shingle"), col("bloom_bits")))
      .count()
    // true members are a lower bound on pass; the spec demands the
    // filter rejects at least half of everything else (at this build
    // size the theoretical fp rate is far below that — the loose bound
    // keeps the spec data-robust)
    val members = train.join(bench.distinct(), "shingle").count()
    assert(pass >= members)
    val nonMembers = total - members
    val falsePos = pass - members
    assert(falsePos.toDouble / nonMembers <= 0.5,
      s"fp rate ${falsePos.toDouble / nonMembers} — filter rejects too little")
  }
}
