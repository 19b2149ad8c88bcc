package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[TopTokenCountExpr]] to the interpreted lambda chain it replaced
  * in the repetition filter —
  * `array_max(transform(array_distinct(a), w -> size(filter(a, x -> x = w))))`
  * — on real corpus token arrays and on every edge the chain's null
  * semantics produce (empty array → NULL, NULL elements count 0, ties).
  */
class TopTokenCountSpec extends SparkSpec {

  import spark.implicits._

  private val lambdaForm =
    expr("array_max(transform(array_distinct(a), w -> size(filter(a, x -> x = w))))")
      .cast("long")

  private def diffOn(d: org.apache.spark.sql.DataFrame): Long =
    d.select(
        TopTokenCountExpr.topTokenCount(col("a")).as("got"),
        lambdaForm.as("want"))
      .filter(!(col("got") <=> col("want")))
      .count()

  test("matches the lambda chain on sf0.001 corpus token arrays") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(split(trim(col("text")), "\\s+").as("a"))
    assert(diffOn(d) == 0)
  }

  test("edges: empty array is NULL, nulls count 0, ties, empty-string tokens") {
    val d = Seq(
      Seq("a", "b", "a", "c", "a"),      // clear winner: 3
      Seq("x"),                          // singleton: 1
      Seq("t", "t", "u", "u"),           // tie: 2
      Seq(""),                           // empty-string token: 1
      Seq.empty[String]                  // empty array: NULL
    ).toDF("a")
    assert(diffOn(d) == 0)
    val got = d.select(TopTokenCountExpr.topTokenCount(col("a")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 2L, 1L, -1L))
    // arrays with NULL elements: the lambda's `x = w` is NULL-valued, so
    // filter drops every row and the null entry contributes count 0
    val withNulls = Seq(
      (1L, Seq[String](null, null)),     // all-null: max over {0} = 0
      (2L, Seq[String]("a", null, "a"))  // null beside repeats: 2
    ).toDF("id", "a")
    assert(diffOn(withNulls) == 0)
    val gn = withNulls.orderBy(col("id"))
      .select(TopTokenCountExpr.topTokenCount(col("a")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(gn == Seq(0L, 2L))
  }

  test("property: expr == lambda chain on generated token arrays") {
    // GenSoup discipline (round 13): arrays with empty-string tokens and
    // heavy duplicates; plus a null element spliced into every 4th array
    // (the lambda chain's null semantics are the subtle part)
    val arrays = GenSoup.sample(GenSoup.tokenArrayGen).zipWithIndex.map {
      case (a, i) if i % 4 == 0 => (null: String) +: a
      case (a, _) => a
    }
    assert(diffOn(arrays.map(Tuple1(_)).toDF("a")) == 0)
  }

  test("two instances in one codegen scope compile (fresh local names)") {
    // ADVICE r12: doGenCode used a FIXED local variable name; with a
    // non-nullable child, nullSafeCodeGen emits the snippet without an
    // enclosing block, so two instances in one projection produced a
    // janino duplicate-variable error and a silent fallback to the
    // interpreted path. split() over a non-null literal column gives the
    // non-nullable child; spark.sql.codegen.fallback=false makes a
    // codegen failure a test failure instead of a silent slow path.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val d = Seq("a b a", "x y").toDF("t")
        .select(split(col("t"), " ").as("a"), split(col("t"), " ").as("b"))
      val rows = d.select(
          TopTokenCountExpr.topTokenCount(col("a")).as("ca"),
          TopTokenCountExpr.topTokenCount(col("b")).as("cb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((2L, 2L), (1L, 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
