package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[Md5Hash60Expr]] to the declarative portable-hash
  * chain it replaced (`cast(conv(substring(md5(s),1,15),16,10) as
  * bigint)`) — the identity every DuckDB oracle replays.
  */
class Md5Hash60Spec extends SparkSpec {

  import spark.implicits._

  private val hof = expr(
    "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)")

  test("native == conv(substring(md5)) chain on ids, salted composites, unicode") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(lit("boot9:"), col("doc_id").cast("string")).as("s"))
      .union(Seq("", "a", "héllo wörld", "boot9:123:31").toDF("s"))
    val diff = docs
      .select(Md5Hash60Expr.of(col("s")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
    // non-negative by construction (top 60 bits)
    assert(docs.select(Md5Hash60Expr.of(col("s")).as("h"))
      .filter(col("h") < 0).count() == 0)
  }

  test("property: native == chain on generated soup strings") {
    // GenSoup discipline (round 13): whitespace runs, multibyte chars,
    // dense printable soup — the UTF-8 encode step is the only place
    // the native path could diverge from md5(s) on a string column
    val soup = GenSoup.sample(GenSoup.textGen, n = 32, seedBase = 0x6001) ++
      GenSoup.sample(GenSoup.charSoupGen, n = 32, seedBase = 0x6002)
    val d = soup.toDF("s")
    assert(d.select(Md5Hash60Expr.of(col("s")).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count() == 0)
  }
}
