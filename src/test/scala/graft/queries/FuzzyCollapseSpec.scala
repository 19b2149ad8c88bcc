package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the identical-name collapse in q_fuzzy_match (round 7): on a
  * feed where the SAME names recur under many keys — the shape the 100×
  * rehearsal corpus exposed, and the norm in real dirty batches — the
  * collapsed blocking+verify must produce EXACTLY what the uncollapsed
  * definition produces: every probe resolves to the best candidate
  * under the (levenshtein distance, candidate key) total order.
  *
  * The spec builds a replicated customer table (every record duplicated
  * under offset keys with an IDENTICAL name), runs the production query
  * against it, and compares with a brute-force cross-join reference
  * computed here — small enough to be exact, independent of the
  * query's blocking path.
  */
class FuzzyCollapseSpec extends SparkSpec {

  test("q_fuzzy_match on a duplicate-name feed equals the brute-force best match") {
    import spark.implicits._
    val base = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_name"))
      .limit(200)
    // two extra copies of every record, offset keys ≡ 0 mod 20 so the
    // probe selection (c_custkey % 20 == 0) keeps its density
    val replicated = (0 to 2).map(k =>
        base.select((col("c_custkey") + lit(k * 10000000L)).as("c_custkey"),
          col("c_name")))
      .reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-collapse").toString
    replicated.write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = CurationQueries.qFuzzyMatch(spark, dir)
      .select(col("probe_key"), col("matched_key"), col("dist"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    // brute force: every probe against every candidate, rank 1 by
    // (dist, cand_key) — the definition, with no blocking at all
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val probes = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("probe_key"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1000))
          .as("dirty_name"))
    val want = probes.crossJoin(
        cust.select(col("c_custkey").as("cand_key"), col("c_name").as("cand_name")))
      .withColumn("dist", levenshtein(col("dirty_name"), col("cand_name")))
      .filter(col("dist") <= 2)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_key")).orderBy(col("dist"), col("cand_key"))))
      .filter(col("rk") === 1)
      .select(col("probe_key"), col("cand_key"), col("dist").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    assert(got.keySet == want.keySet,
      s"probe sets differ: only-got=${got.keySet -- want.keySet}, only-want=${want.keySet -- got.keySet}")
    val diffs = want.collect { case (k, w) if got(k) != w => (k, got(k), w) }
    assert(diffs.isEmpty, s"first mismatches: ${diffs.take(3).toList}")
    // replicas of the same dirty name must resolve identically
    val probeRows = probes.collect().map(r => r.getLong(0) -> r.getString(1))
    probeRows.groupBy(_._2).foreach { case (_, ks) =>
      val answers = ks.map(k => got(k._1)).distinct
      assert(answers.size == 1, s"same name resolved differently: $ks -> $answers")
    }
  }
}
