package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[DelNeighborsExpr]] to the declarative FastSS form it
  * replaced at the six entity-resolution call sites:
  * `transform(array_distinct(<0/1/2-deletion variants>), v -> xxhash64(v))`.
  * Compared as SORTED hash sets — the native expression dedups by hash
  * rather than by variant string, which is set-identical barring an
  * intra-record xxhash64 collision (and consumers `.distinct()` candidate
  * pairs before the exact verify, so even a collision could not change
  * results).
  */
class DelNeighborsExprSpec extends SparkSpec {

  import spark.implicits._

  private val hof = expr(
    s"array_sort(transform(${graft.queries.CurationQueries.delNeighborhood("s")}, v -> xxhash64(v)))")

  test("native deletion-neighborhood hashes == HOF on real customer names") {
    val names = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_name").as("s"))
    val diff = names
      .select(array_sort(DelNeighborsExpr.delNeighborHashes(col("s"))).as("a"),
        hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
    // an n-char string of DISTINCT characters has exactly
    // 1 + n + n(n-1)/2 variants (no deletion collides) — sanity that the
    // neighborhood is actually full; real customer names collide heavily
    // (repeated '0's), which both forms dedup identically
    val n = Seq("abcdefghij").toDF("s")
      .select(size(DelNeighborsExpr.delNeighborHashes(col("s")))).head().getInt(0)
    assert(n == 1 + 10 + 45)
  }

  test("native == HOF on dirty probes, unicode, repeats, and short strings") {
    val docs = Seq("", "a", "ab", "aab", "héllo", "ééé", "Customer#00001",
      "xyxyxyxy").toDF("s")
    val diff = docs
      .select(array_sort(DelNeighborsExpr.delNeighborHashes(col("s"))).as("a"),
        hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
  }

  test("property: native == HOF on generated soup strings") {
    // GenSoup discipline (round 13): truncated because the 0/1/2-deletion
    // neighborhood is O(n^2) variants; soup includes whitespace inside
    // the string and multibyte chars whose deletions must count in
    // codepoints on both paths
    val soup =
      GenSoup.sample(GenSoup.charSoupGen, n = 24, seedBase = 0x2221).map(_.take(18)) ++
      GenSoup.sample(GenSoup.textGen, n = 24, seedBase = 0x2222).map(_.take(14))
    val d = soup.toDF("s")
    val diff = d
      .select(array_sort(DelNeighborsExpr.delNeighborHashes(col("s"))).as("a"),
        hof.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0)
  }

  test("blocking guarantee: ED<=2 pairs share a variant hash") {
    // deleting the edited positions from each side reaches a common string
    val pairs = Seq(
      ("Customer#000000123", "Customer#00000123"),   // 1 deletion
      ("Customer#000000123", "Customer#0000123"),    // 2 deletions
      ("abcdef", "abdcef")                           // transposition = 2 edits
    ).toDF("x", "y")
    val shared = pairs.select(size(array_intersect(
      DelNeighborsExpr.delNeighborHashes(col("x")),
      DelNeighborsExpr.delNeighborHashes(col("y")))).as("n")).collect()
    shared.foreach(r => assert(r.getInt(0) > 0))
  }
}
