package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FieldExpr.field

class FieldExprSpec extends SparkSpec {
  import spark.implicits._

  private val days =
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")

  test("field returns 1-based position, 0 for absent and null (MySQL semantics)") {
    val got = Seq("Wednesday", "Monday", "Sunday", "Nope", null)
      .toDF("w")
      .select(field(col("w"), days: _*).as("p"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 1L, 7L, 0L, 0L))
  }

  test("field works under whole-stage codegen over many rows") {
    // enough rows to exercise the generated code path end to end
    val df = spark.range(1000)
      .select((col("id") % 7).cast("int").as("i"))
      .select(col("i"), element_at(typedLit(days), col("i") + 1).as("w"))
    val bad = df
      .filter(field(col("w"), days: _*) =!= (col("i") + 1).cast("long"))
      .count()
    assert(bad == 0)
  }

  test("field sorts Qc weekdays in domain order") {
    val got = Seq("Sunday", "Friday", "Monday", "Wednesday")
      .toDF("w")
      .orderBy(field(col("w"), days: _*))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("Monday", "Wednesday", "Friday", "Sunday"))
  }

  test("registered SQL surface: FIELD and DAYNAME run as in the MySQL text") {
    FieldExpr.register(spark)
    val r = sql(
      """SELECT FIELD('Tuesday', 'Monday','Tuesday','Wednesday') AS p,
        |       DAYNAME(DATE '2024-11-01') AS d""".stripMargin).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getString(1) == "Friday")
  }

  test("field is foldable for constant inputs") {
    val r = sql("SELECT 1 AS one").select(
      field(lit("b"), "a", "b").as("p")).collect()(0)
    assert(r.getLong(0) == 2L)
  }

  test("property: field == coalesce(array_position) on generated needles") {
    // GenSoup discipline (round 13): a small alphabet forces duplicate
    // candidates (first match must win), absences, the empty string,
    // case variants, and null needles (MySQL FIELD -> 0, not NULL)
    val cands = Seq("a", "b", "a", "", "é")
    val needleGen: org.scalacheck.Gen[String] = org.scalacheck.Gen.frequency(
      6 -> org.scalacheck.Gen.oneOf("a", "b", "c", "", "é", "A"),
      1 -> org.scalacheck.Gen.const[String](null))
    val needles = GenSoup.sample(needleGen, n = 64, seedBase = 0xF1E1D)
    val d = needles.toDF("w")
    val want = coalesce(
      array_position(array(cands.map(lit): _*), col("w")), lit(0L))
    val diff = d.select(field(col("w"), cands: _*).as("got"), want.as("want"))
      .filter(col("got") =!= col("want"))
    assert(diff.count() == 0)
    // duplicate candidate: position of the FIRST 'a'
    assert(sql("SELECT 1").select(field(lit("a"), cands: _*))
      .head().getLong(0) == 1L)
  }
}
