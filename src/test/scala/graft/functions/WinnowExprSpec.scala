package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[WinnowFingerprintsExpr]] to the two-stage HOF chain
  * it replaced in minimizerPairs: per-shingle
  * `cast(conv(substring(md5(...),1,15),16,10) as bigint)` hashing, then
  * `array_distinct(transform(..., j -> array_min(slice(hs, j, 4))))`
  * window minima — identical arrays, order included.
  */
class WinnowExprSpec extends SparkSpec {

  import spark.implicits._

  private val hof = expr(
    """array_distinct(transform(sequence(1, size(tk)-5), j -> array_min(slice(
      |  transform(sequence(0, size(tk)-3),
      |    i -> cast(conv(substring(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 15), 16, 10) as bigint)),
      |  j, 4))))""".stripMargin)

  test("native winnowing fingerprints == HOF chain on the sf0.001 corpus") {
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 6)
    val diff = toks
      .select(WinnowFingerprintsExpr.fingerprints(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
    assert(toks.select(WinnowFingerprintsExpr.fingerprints(col("tk")))
      .head().getSeq[Long](0).nonEmpty)
  }

  test("native == HOF on edge shapes; short token arrays yield empty") {
    val docs = Seq(
      "a b c d e f",                              // exactly one window
      "a b c d e f g h",
      "x x x x x x x x x x",                      // all hashes identical
      (1 to 40).map(i => s"t${i % 5}").mkString(" ")) // repeating pattern
      .toDF("text")
      .select(split(col("text"), " ").as("tk"))
    assert(docs.select(WinnowFingerprintsExpr.fingerprints(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
    val short = Seq(Tuple1(Seq("a", "b", "c", "d", "e"))).toDF("tk")
      .select(WinnowFingerprintsExpr.fingerprints(col("tk"))).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("property: native == HOF on generated token arrays (empties, dups)") {
    // GenSoup discipline (round 13): empty-string tokens and heavy
    // duplicates — window minima over identical hashes and boundary
    // windows are where an off-by-one would live
    val arrays = GenSoup.sample(GenSoup.tokenArrayGen, seedBase = 0x3333)
      .filter(_.size >= 6)
    assert(arrays.nonEmpty)
    val d = arrays.map(Tuple1(_)).toDF("tk")
    assert(d.select(WinnowFingerprintsExpr.fingerprints(col("tk")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
  }
}
