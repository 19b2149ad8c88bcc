package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the master-side identical-name collapse in q_golden_record
  * (round 8): on a master table where the SAME names recur under many
  * keys — the 100× rehearsal shape — the collapsed blocking+verify must
  * produce EXACTLY the golden records the uncollapsed definition
  * produces: each dirty record resolves to the best master under the
  * (levenshtein distance, master key) total order, then survivorship
  * aggregates per entity.
  *
  * Reference computed here by brute force (cross join, no blocking, per
  * RECORD not per distinct name), independent of the query's code path.
  */
class GoldenCollapseSpec extends SparkSpec {

  test("q_golden_record on a duplicate-name master equals the brute-force fusion") {
    val base = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_name"))
      .limit(200)
    // two extra copies of every master under offset keys (≡ 0 mod 20 so
    // the dirty-feed selection keeps its density) with IDENTICAL names
    val replicated = (0 to 2).map(k =>
        base.select((col("c_custkey") + lit(k * 1000000L)).as("c_custkey"),
          col("c_name")))
      .reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("golden-collapse").toString
    replicated.write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = CurationQueries.qGoldenRecord(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

    // brute force: the fixture's dirty feed, best master per dirty
    // RECORD via an unblocked cross join, then the same survivorship
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val dirty = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"), col("c_name"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("v"))
      .select((col("c_custkey") * 10 + col("v") + 10000000L).as("record_id"),
        when(col("v") === 3,
          expr("substring(c_name, 1, length(c_name) - 1)"))
          .otherwise(
            concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1000)))
          .as("name"))
    val best = dirty.crossJoin(
        cust.select(col("c_custkey").as("cand"), col("c_name").as("cand_name")))
      .withColumn("dist", levenshtein(col("name"), col("cand_name")))
      .filter(col("dist") <= 2)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("record_id")).orderBy(col("dist"), col("cand"))))
      .filter(col("rk") === 1)
      .select(col("record_id"), col("cand").as("entity_id"))
    val members = dirty.join(best, Seq("record_id"))
      .select(col("entity_id"), col("record_id"), col("name"))
      .unionByName(cust.select(col("c_custkey").as("entity_id"),
        col("c_custkey").as("record_id"), col("c_name").as("name")))
    val canon = members
      .groupBy(col("entity_id"), col("name"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("entity_id"))
      .agg(
        min_by(col("name"), struct((-col("cnt")).as("nc"), col("name")))
          .as("canonical_name"),
        count(lit(1)).as("n_names"))
    val want = members.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"), min(col("record_id")).as("master_id"))
      .filter(col("n_records") > 1)
      .join(canon, Seq("entity_id"))
      .select(col("entity_id"), col("master_id"), col("n_records"),
        col("n_names"), col("canonical_name"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

    assert(want.nonEmpty, "brute-force fusion produced no multi-record entities")
    assert(got == want,
      s"golden records diverge: only-got=${(got -- want).take(3)}, " +
        s"only-want=${(want -- got).take(3)}")
  }
}
