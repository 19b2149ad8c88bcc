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
}
